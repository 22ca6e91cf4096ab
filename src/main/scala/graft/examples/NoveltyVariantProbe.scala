package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** noveltyReport shape probe (round 13). Three candidate plans:
  *
  *  - SHIPPED (one-pass): the exploded (id, fp) frame LEFT joins the
  *    distinct reference fps marking each gram seen/unseen, and ONE
  *    groupBy(id) carries both per-doc counts (total + unseen) — one
  *    shingle pass, one fp join, one aggregate, one join back, no cache.
  *  - B (pre-round-13): the exploded frame PERSISTED for two consumers —
  *    a groupBy(id) that only re-counts the per-doc gram totals, plus the
  *    LEFT ANTI novel count — then TWO joins back. The persist caches the
  *    ~gram-multiplied corpus (n_grams × rows ≈ 50× the corpus bytes
  *    here), a dependency that cannot exist against a 100-TB corpus.
  *  - C (row-local totals): n_grams = size(shingleSet(text)) computed in
  *    the output projection (no persist, anti-join for novel) — the first
  *    rewrite attempt; it pays a SECOND full shingle pass over the corpus
  *    only to re-derive a count the explode pass already knew.
  *
  * The timed body aggregates BOTH output columns (sum of n_grams and
  * novelty_ppm) — a bare count() would let Catalyst prune row-local
  * projections and measure nothing (the StripBoilerplateProbe lesson).
  *
  * Usage: sbt "runMain graft.examples.NoveltyVariantProbe [sizesCsv]"
  */
object NoveltyVariantProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000000, 2000000, 4000000))
    val wpd = 50
    val gramN = 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Curation

    // seed shifts the content space so ref overlaps ~half the corpus grams
    def corpus(n: Int, seed: Long): DataFrame = spark.range(n.toLong)
      .select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => conv(pmod(xxhash64((col("id") / 2).cast("long") *
            lit(1000003L) + i + lit(seed)), lit(60466176L))
            .cast("string"), 10, 36)), " ").as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()

    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ graft.functions.HashExpressions
          .shingleSet(col("text"), gramN).as("__sh"): _*)
        .select(cols :+ explode(col("__sh")).as("__gram"): _*)
        .select(cols :+ md5(col("__gram")).as("__fp"): _*)

    def ppm(out: DataFrame): DataFrame = out
      .select(col("doc_id"), col("n_grams"), col("novel_grams"),
        when(col("n_grams") > 0, expr(
          "(novel_grams div n_grams) * 1000000L" +
            " + (2L * (novel_grams % n_grams) * 1000000L + n_grams)" +
            " div (2L * n_grams)")).as("novelty_ppm"))

    /** Variant B: the pre-round-13 noveltyReport plan, verbatim. */
    def noveltyPersisted(docs: DataFrame, ref: DataFrame): DataFrame = {
      val docGrams = grams(docs, col("doc_id")).persist()
      val refGrams = grams(ref).select("__fp").distinct()
      val sizes = docGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val novel = docGrams.join(refGrams, Seq("__fp"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("novel_grams"))
      ppm(docs.select(col("doc_id"))
        .join(sizes, Seq("doc_id"), "left")
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("novel_grams"), lit(0L)).as("novel_grams")))
    }

    /** Variant C: row-local totals, anti-join novel count, no persist. */
    def noveltyRowLocalTotals(docs: DataFrame, ref: DataFrame): DataFrame = {
      val refGrams = grams(ref).select("__fp").distinct()
      val novel = grams(docs, col("doc_id"))
        .join(refGrams, Seq("__fp"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("novel_grams"))
      ppm(docs.select(col("doc_id"),
          coalesce(
            size(graft.functions.HashExpressions.shingleSet(col("text"), gramN))
              .cast("long"), lit(0L)).as("n_grams"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("novel_grams"), lit(0L)).as("novel_grams")))
    }

    // full-materialization aggregate over BOTH published columns
    def drain(out: DataFrame): Long = out
      .agg(sum("n_grams"), sum("novelty_ppm")).collect()(0).getLong(0)

    // ALTERNATING arms (shipped, B, C, shipped, B, C, …), min per arm: a
    // sequential-arm run let one sustained environmental window poison a
    // single arm's every rep while its rivals ran in the calm (first run
    // of this probe measured B at the SAME wall time for 1M and 2M docs —
    // physically impossible); interleaving puts every arm inside and
    // outside the window.
    def timedRound(prepare: () => Unit)(body: => Long): Double = {
      spark.catalog.clearCache()
      prepare()
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (untimed) + output equivalence across all three shapes
    {
      val w = corpus(100000, 0L); val r = corpus(50000, 7L)
      w.count(); r.count()
      val shipped = Curation.noveltyReport(w, "doc_id", "text", r, "text", gramN)
      assert(shipped.exceptAll(noveltyPersisted(w, r)).isEmpty &&
        noveltyPersisted(w, r).exceptAll(shipped).isEmpty, "shipped != B")
      assert(shipped.exceptAll(noveltyRowLocalTotals(w, r)).isEmpty &&
        noveltyRowLocalTotals(w, r).exceptAll(shipped).isEmpty, "shipped != C")
      drain(shipped)
      w.unpersist(blocking = true); r.unpersist(blocking = true)
      spark.catalog.clearCache()
      println("warmup done (3-way output equivalence asserted)")
    }

    for (n <- sizes) {
      val docs = corpus(n, 0L)
      val ref = corpus(n / 2, 7L)
      docs.count(); ref.count()
      val prep = () => {
        docs.persist(); ref.persist(); docs.count(); ref.count(); ()
      }
      val rounds = (1 to 3).map { _ =>
        (timedRound(prep) {
          drain(Curation.noveltyReport(docs, "doc_id", "text", ref, "text", gramN))
        },
          timedRound(prep) { drain(noveltyPersisted(docs, ref)) },
          timedRound(prep) { drain(noveltyRowLocalTotals(docs, ref)) })
      }
      val tShipped = rounds.map(_._1).min
      val tB = rounds.map(_._2).min
      val tC = rounds.map(_._3).min
      println(f"[$n%8d] shipped(one-pass) $tShipped%8.2f s   B(persisted+2joins) $tB%8.2f s (${tB / tShipped}%.2fx)   C(2nd shingle pass) $tC%8.2f s (${tC / tShipped}%.2fx)")
      println(s"         samples shipped=${rounds.map(r => f"${r._1}%.2f").mkString("/")} B=${rounds.map(r => f"${r._2}%.2f").mkString("/")} C=${rounds.map(r => f"${r._3}%.2f").mkString("/")}")
      docs.unpersist(blocking = true); ref.unpersist(blocking = true)
    }
    spark.stop()
  }
}
