package graft.report

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.ReferenceTables
import CondensedJoin._

/** The three reference reports over a finished job's stage tables.
  * Reference: `/root/reference/src/groovy/haplorec/util/pipeline/Report.groovy:17-176`.
  */
object Reports {

  /** User-facing column aliases (`pipeline/Report.groovy:186-197`). */
  val aliases: Map[String, String] = Map(
    "PATIENT_ID" -> "SAMPLE_ID",
    "GENE_NAME" -> "GENE",
    "DRUG_NAME" -> "DRUG",
    "PHENOTYPE_NAME" -> "PHENOTYPE",
    "HAPLOTYPE_NAME1" -> "HAPLOTYPE1",
    "HAPLOTYPE_NAME2" -> "HAPLOTYPE2",
    "HAPLOTYPE_NAME" -> "HAPLOTYPE",
    "SNP_ID" -> "RS#",
    "HET_COMBO" -> "HET_COMBO",
    "HET_COMBOS" -> "#HET_COMBOS")

  /** Strip the `table__` prefix, uppercase, apply aliases
    * (`pipeline/Report.groovy:205-210`).
    */
  def friendlyName(namespaced: String): String = {
    val bare = namespaced.replaceAll("^.*__", "").toUpperCase
    aliases.getOrElse(bare, bare)
  }

  /** Globally dense 1-based ids in `orderCols` order WITHOUT the
    * single-partition global window (`Window.orderBy` with no partition
    * moves the whole frame to one task — the WindowExec warning, and a
    * straight bottleneck on a job-scale stage table): range-partition on
    * the ordering (ascending nulls first, `SortOrder`'s default), sort
    * within partitions, then `zipWithIndex` — the [[graft.ops.Ingest]]
    * FK-resolution idiom. The extra job zipWithIndex runs to learn
    * partition sizes is a count per partition, not a data movement. Rows
    * tying on ALL of `orderCols` receive arbitrary-but-dense ids — callers
    * must pass an ordering that is total over every column they observe.
    */
  private[report] def sequentialId(
      df: DataFrame, orderCols: Seq[Column], idCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      },
      schema)
  }

  /** Stage frames get a surrogate per-row id (the reference tables carry
    * auto_increment ids used as duplicate keys) in the frame's full column
    * ordering — total over every column, so the assignment is
    * deterministic; computed once per report build via [[sequentialId]].
    *
    * Reference tables are driver-resident literals (LocalRelation), and
    * running THEIR id assignment distributed costs a RangePartitioner
    * sample job + a zipWithIndex partition-count job + an RDD round trip
    * per report build (guide §1.2/§5 — action churn, not data work). When
    * the optimized plan is already a bounded LocalRelation of atomic
    * types, sort + index on the driver with the identical ordering
    * semantics (unsigned UTF-8 bytes for strings = Spark's UTF8String
    * order; natural numeric order, NaN greatest, -0.0 = 0.0; nulls
    * first); anything else — stage frames above all — keeps the
    * scale-safe distributed path.
    */
  private def withId(df: DataFrame): DataFrame =
    localWithId(df).getOrElse(
      sequentialId(df, df.columns.map(c => col(c).asc_nulls_first).toSeq, "id"))

  private val localWithIdMaxRows = 100000

  private[report] def localWithId(df: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val local = df.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    val supported = df.schema.fields.forall(_.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
          BooleanType | DoubleType | FloatType => true
      case _ => false
    })
    if (!local || !supported) return None
    val rows = df.collect() // LocalTableScan: returns driver rows, no job
    if (rows.length > localWithIdMaxRows) return None
    def cmpValue(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1 // nulls first
      case (_, null) => 1
      case (x: String, y: String) =>
        java.util.Arrays.compareUnsigned(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(x, y)
      case (x: java.lang.Integer, y: java.lang.Integer) => Integer.compare(x, y)
      case (x: java.lang.Short, y: java.lang.Short) => java.lang.Short.compare(x, y)
      case (x: java.lang.Byte, y: java.lang.Byte) => java.lang.Byte.compare(x, y)
      case (x: java.lang.Boolean, y: java.lang.Boolean) =>
        java.lang.Boolean.compare(x, y)
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.compare(x + 0.0, y + 0.0) // -0.0 == 0.0, NaN last
      case (x: java.lang.Float, y: java.lang.Float) =>
        java.lang.Float.compare(x + 0.0f, y + 0.0f)
      case _ => throw new IllegalStateException("unsupported local sort type")
    }
    val n = df.columns.length
    val sorted = rows.sortWith { (r1, r2) =>
      var i = 0
      var c = 0
      while (i < n && c == 0) { c = cmpValue(r1.get(i), r2.get(i)); i += 1 }
      c < 0
    }
    val withIds: Seq[org.apache.spark.sql.Row] = sorted.zipWithIndex.map {
      case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }.toSeq
    val schema = StructType(
      df.schema.fields :+ StructField("id", LongType, nullable = false))
    Some(df.sparkSession.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(withIds).asJava), schema))
  }

  private def usingOn(left: Seq[(String, String)], table: String,
      cols: Seq[String]): Column = CondensedJoin.usingOn(left, table, cols)

  /** Truncate a stage frame's lineage at the report boundary (lazy
    * `localCheckpoint`): the report spec references 4–5 stage frames whose
    * logical plans each inline the full pipeline lineage, and every
    * broadcast-build / sample action inside one report run re-analyzed and
    * re-stringified those deep trees — measured as ~0.3 s no-job driver
    * gaps (Catalyst `transformDownWithPruning` / `truncatedString` in the
    * main thread) per report at fixture scale, growing with plan depth,
    * not data (guide §5 driver work; §3.3 "materialising an intermediate
    * truncates the plan"). Lazy, so NO extra job: the RDD computes inside
    * the first action that needs it — through `runJob`'s per-stage
    * persists, so total stage compute is unchanged — and the blocks are
    * released by the caller's storage sweep like every operator persist.
    */
  private def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Phenotype-path drug recommendation report
    * (`pipeline/Report.groovy:54-114`): recommendation → its drug details →
    * the phenotypes that caused it → the genotype behind each phenotype →
    * the haplotypes behind the genotype → the variants behind each call.
    */
  def phenotypeDrugRecommendationReport(
      spark: SparkSession,
      stages: Map[String, DataFrame],
      refs: ReferenceTables,
      jobId: Long): DataFrame = {
    val jppdr = pin(stages("phenotypeDrugRecommendation")
      .filter(col("job_id") === jobId))
    val tables: Map[String, DataFrame] = Map(
      "jppdr" -> jppdr,
      "dr" -> withId(refs.drugRecommendation.drop("id")),
      "gpdr" -> refs.genePhenotypeDrugRecommendation,
      "jpgp" -> withId(pin(stages("genePhenotype"))),
      "gp" -> refs.genotypePhenotype,
      "jpg" -> pin(stages("genotype")),
      "jpgh" -> pin(stages("geneHaplotype")),
      "ghv" -> refs.geneHaplotypeVariant,
      "jpv" -> pin(stages("variant")))

    val spec = Spec(
      select = Seq(
        "jppdr" -> Seq("patient_id", "drug_recommendation_id", "het_combo", "het_combos"),
        "dr" -> Seq("drug_name", "recommendation"),
        "jpgp" -> Seq("gene_name", "phenotype_name"),
        "jpg" -> Seq("haplotype_name1", "haplotype_name2"),
        "jpgh" -> Seq("haplotype_name"),
        "jpv" -> Seq("snp_id", "allele")),
      root = "jppdr",
      joins = Seq(
        Join("dr", "left", _ => col2("jppdr", "drug_recommendation_id") === col2("dr", "id")),
        Join("gpdr", "left", have => usingOn(have, "gpdr", Seq("drug_recommendation_id"))),
        Join("jpgp", "left", have => usingOn(have, "jpgp",
          Seq("job_id", "patient_id", "gene_name", "phenotype_name", "het_combo"))),
        Join("gp", "left", have => usingOn(have, "gp", Seq("gene_name", "phenotype_name"))),
        Join("jpg", "left", have => usingOn(have, "jpg",
          Seq("job_id", "patient_id", "haplotype_name1", "haplotype_name2", "het_combo"))),
        Join("jpgh", "left", _ =>
          col2("jpgh", "job_id") === col2("jpg", "job_id") &&
            col2("jpgh", "patient_id") === col2("jpg", "patient_id") &&
            col2("jpgh", "gene_name") === col2("jpg", "gene_name") &&
            col2("jpgh", "het_combo") === col2("jpg", "het_combo") &&
            (col2("jpgh", "haplotype_name") === col2("jpg", "haplotype_name1") ||
              col2("jpgh", "haplotype_name") === col2("jpg", "haplotype_name2"))),
        Join("ghv", "left", _ =>
          col2("ghv", "gene_name") === col2("jpgh", "gene_name") &&
            col2("ghv", "haplotype_name") === col2("jpgh", "haplotype_name")),
        Join("jpv", "left", _ =>
          col2("jpv", "patient_id") === col2("jpgh", "patient_id") &&
            col2("jpv", "job_id") === col2("jpgh", "job_id") &&
            col2("jpv", "snp_id") === col2("ghv", "snp_id") &&
            col2("jpv", "allele") === col2("ghv", "allele"))),
      duplicateKey = Map(
        "dr" -> Seq(Own("id"), Foreign("jppdr", "job_id"), Foreign("jppdr", "patient_id")),
        "jpgp" -> Seq(Own("id"), Foreign("dr", "id")),
        "jpgh" -> Seq(Own("job_id"), Own("patient_id"), Own("gene_name"), Own("haplotype_name")),
        "jpv" -> Seq(Own("job_id"), Own("patient_id"),
          Foreign("jpgh", "gene_name"), Foreign("jpgh", "haplotype_name"),
          Own("allele"), Own("snp_id"))))

    renameFriendly(condensed(spec, tables))
  }

  /** Genotype-path drug recommendation report
    * (`pipeline/Report.groovy:119-176`).
    */
  def genotypeDrugRecommendationReport(
      spark: SparkSession,
      stages: Map[String, DataFrame],
      refs: ReferenceTables,
      jobId: Long): DataFrame = {
    val jpgdr = pin(stages("genotypeDrugRecommendation")
      .filter(col("job_id") === jobId))
    val tables: Map[String, DataFrame] = Map(
      "jpgdr" -> jpgdr,
      "dr" -> withId(refs.drugRecommendation.drop("id")),
      "gdr" -> refs.genotypeDrugRecommendation,
      "jpg" -> withId(pin(stages("genotype"))),
      "jpgh" -> pin(stages("geneHaplotype")),
      "ghv" -> refs.geneHaplotypeVariant,
      "jpv" -> pin(stages("variant")))

    val spec = Spec(
      select = Seq(
        "jpgdr" -> Seq("patient_id", "drug_recommendation_id", "het_combo", "het_combos"),
        "dr" -> Seq("drug_name", "recommendation"),
        "jpg" -> Seq("gene_name", "haplotype_name1", "haplotype_name2"),
        "jpgh" -> Seq("haplotype_name"),
        "jpv" -> Seq("snp_id", "allele")),
      root = "jpgdr",
      joins = Seq(
        Join("dr", "left", _ => col2("jpgdr", "drug_recommendation_id") === col2("dr", "id")),
        Join("gdr", "left", have => usingOn(have, "gdr", Seq("drug_recommendation_id"))),
        Join("jpg", "left", have => usingOn(have, "jpg",
          Seq("job_id", "patient_id", "haplotype_name1", "haplotype_name2", "het_combo"))),
        Join("jpgh", "left", _ =>
          col2("jpgh", "job_id") === col2("jpg", "job_id") &&
            col2("jpgh", "patient_id") === col2("jpg", "patient_id") &&
            col2("jpgh", "gene_name") === col2("jpg", "gene_name") &&
            col2("jpgh", "het_combo") === col2("jpg", "het_combo") &&
            (col2("jpgh", "haplotype_name") === col2("jpg", "haplotype_name1") ||
              col2("jpgh", "haplotype_name") === col2("jpg", "haplotype_name2"))),
        Join("ghv", "left", _ =>
          col2("ghv", "gene_name") === col2("jpgh", "gene_name") &&
            col2("ghv", "haplotype_name") === col2("jpgh", "haplotype_name")),
        Join("jpv", "left", _ =>
          col2("jpv", "patient_id") === col2("jpgh", "patient_id") &&
            col2("jpv", "job_id") === col2("jpgh", "job_id") &&
            col2("jpv", "snp_id") === col2("ghv", "snp_id") &&
            col2("jpv", "allele") === col2("ghv", "allele"))),
      duplicateKey = Map(
        "dr" -> Seq(Own("id"), Foreign("jpgdr", "job_id"), Foreign("jpgdr", "patient_id")),
        "jpg" -> Seq(Own("id"), Foreign("dr", "id")),
        "jpgh" -> Seq(Own("job_id"), Own("patient_id"), Own("gene_name"), Own("haplotype_name")),
        "jpv" -> Seq(Own("job_id"), Own("patient_id"),
          Foreign("jpgh", "gene_name"), Foreign("jpgh", "haplotype_name"),
          Own("allele"), Own("snp_id"))))

    renameFriendly(condensed(spec, tables))
  }

  private def renameFriendly(df: DataFrame): DataFrame = {
    // Later duplicate friendly names (e.g. two HAPLOTYPE columns) get
    // numeric suffixes to stay addressable. Renamed in ONE projection
    // (toDF), not a withColumnRenamed fold — a fold nests one Project per
    // column and the analyzer re-walks the tree per level.
    val seen = scala.collection.mutable.Map[String, Int]()
    val names = df.columns.map { c =>
      val base = friendlyName(c)
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"$base$n"
    }
    df.toDF(names.toIndexedSeq: _*)
  }

  /** Novel-haplotype matrix report (`pipeline/Report.groovy:17-34` + matrix
    * iteration R3): per gene with novel calls, the known-haplotype matrix
    * plus one row per (patient, chromosome, combo) novel haplotype, columns
    * = the gene's SNPs in sorted order.
    */
  def novelHaplotypeReport(
      spark: SparkSession,
      stages: Map[String, DataFrame],
      refs: ReferenceTables,
      jobId: Long): Map[String, DataFrame] = {
    import spark.implicits._
    val novel = pin(stages("novelHaplotype").filter(col("job_id") === jobId))
    val variantPinned = pin(stages("variant").filter(col("job_id") === jobId))
    val genes = novel.select("gene_name").distinct()
      .orderBy("gene_name").as[String].collect()
    // Pivot-column inference (`pivot(col)` with no values) runs an extra
    // distinct+sort job over the UNION frame — whose lineage embeds the
    // whole pipeline — per gene. The pivot columns are knowable up front:
    // they are exactly the gene's snp set (the `known` half carries every
    // (haplotype, snp) pair of the gene, and patient rows are filtered to
    // the same `gene_snp` set), in inferred-pivot order (ascending = the
    // same unsigned-UTF-8 string sort). When the reference frame is a
    // driver-resident literal, read that set off the driver for free;
    // otherwise keep the inferred pivot (one small job at refs scale).
    val localSnps: Option[Map[String, Seq[String]]] = {
      val ghv = refs.geneHaplotypeVariant
      if (ghv.queryExecution.optimizedPlan
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) {
        val gI = ghv.schema.fieldIndex("gene_name")
        val sI = ghv.schema.fieldIndex("snp_id")
        Some(ghv.collect() // LocalTableScan: driver rows, no job
          .map(r => (r.getString(gI), r.getString(sI))).distinct
          .groupBy(_._1)
          .map { case (g, ps) =>
            g -> ps.map(_._2).sortWith((a, b) =>
              java.util.Arrays.compareUnsigned(
                a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0).toSeq
          })
      } else None
    }
    genes.map { gene =>
      val known = refs.geneHaplotypeVariant
        .filter(col("gene_name") === gene)
        .select(col("haplotype_name").as("row_name"), col("snp_id"), col("allele"))
      val patientRows = novel.filter(col("gene_name") === gene)
        .join(variantPinned,
          Seq("job_id", "patient_id", "physical_chromosome"))
        .join(refs.geneSnp.filter(col("gene_name") === gene).select("snp_id"), Seq("snp_id"))
        .select(
          concat(lit("Sample "), col("patient_id"), lit(", chr"),
            col("physical_chromosome"), lit(" ("), col("het_combo"), lit("/"),
            col("het_combos"), lit(")")).as("row_name"),
          col("snp_id"), col("allele"))
      val grouped = known.unionByName(patientRows).groupBy("row_name")
      val pivoted = localSnps.flatMap(_.get(gene)) match {
        case Some(snps) => grouped.pivot("snp_id", snps)
        case None => grouped.pivot("snp_id")
      }
      gene -> pivoted.agg(first("allele")).orderBy("row_name")
    }.toMap
  }
}
