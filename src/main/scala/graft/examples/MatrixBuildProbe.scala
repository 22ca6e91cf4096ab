package graft.examples

import org.apache.spark.sql.SparkSession

/** Round-17: time ReferenceTables.broadcastMatrices end to end at the q31
  * load-gate scale (151 snps × 132 haplotypes × 100 genes ≈ 2M rows),
  * repeated so JIT effects show. Usage: tools/runjava graft.examples.MatrixBuildProbe
  */
object MatrixBuildProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val refs = graft.pipeline.ReferenceTables(
      graft.LoadBench.emptyRefs(spark).drugRecommendation,
      graft.LoadBench.emptyRefs(spark).genePhenotypeDrugRecommendation,
      graft.LoadBench.generateGeneHaplotypeVariant(spark, 151, 132, 100),
      graft.LoadBench.emptyRefs(spark).genotypePhenotype,
      graft.LoadBench.emptyRefs(spark).genotypeDrugRecommendation)
    (1 to 6).foreach { r =>
      val t0 = System.nanoTime()
      val b = refs.broadcastMatrices(spark)
      val t1 = System.nanoTime()
      val n = b.value.size
      b.destroy()
      println(f"run$r broadcastMatrices=${(t1 - t0) / 1e9}%.3f s genes=$n")
    }
    // matched A/B: the historical groupByKey/mapGroups build, replicated
    // verbatim, timed in the SAME session as the shipped single-pass form
    locally {
      import spark.implicits._
      val base = refs.geneHaplotypeVariant
        .select("gene_name", "haplotype_name", "snp_id", "allele")
      (1 to 6).foreach { r =>
        val t0 = System.nanoTime()
        val perGene: Array[(String, Seq[String], Seq[String], Seq[String], Array[Short])] =
          base.as[(String, String, String, String)]
            .groupByKey(_._1)
            .mapGroups { (gene: String, it: Iterator[(String, String, String, String)]) =>
              val rows = it.map(x => (x._2, x._3, x._4)).toVector
              val snps = rows.map(_._2).distinct.sorted
              val m = graft.algo.GeneHaplotypeMatrix(gene, snps, rows)
              (gene, m.snpIds: Seq[String], m.haplotypes: Seq[String],
                m.alleleDict: Seq[String], m.cells)
            }
            .collect()
        val matrices = perGene.map { case (gene, snps, haps, dict, cells) =>
          gene -> graft.algo.GeneHaplotypeMatrix(gene, snps.toVector,
            haps.toVector, dict.toVector, cells)
        }.toMap
        val b = spark.sparkContext.broadcast(matrices)
        val t1 = System.nanoTime()
        val n = b.value.size
        b.destroy()
        println(f"OLD run$r groupByKey build=${(t1 - t0) / 1e9}%.3f s genes=$n")
      }
    }
    // phase timing: replicate the encoded path step by step
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = refs.geneHaplotypeVariant
      .select("gene_name", "haplotype_name", "snp_id", "allele")
    (1 to 4).foreach { r =>
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"  p$r $name ${(now - t) / 1e9}%.3f")
        t = now
      }
      val dictRow = base.agg(
        sort_array(collect_set(col("gene_name"))).as("genes"),
        sort_array(collect_set(col("haplotype_name"))).as("haps"),
        sort_array(collect_set(col("snp_id"))).as("snps"),
        sort_array(collect_set(col("allele"))).as("alleles"),
        count(lit(1)).as("n")).head()
      lap("dictjob")
      val genes = dictRow.getSeq[String](0).toArray
      val haps = dictRow.getSeq[String](1).toArray
      val snps = dictRow.getSeq[String](2).toArray
      val alleles = dictRow.getSeq[String](3).toArray
      def idx(values: Array[String]): java.util.HashMap[String, Integer] = {
        val m = new java.util.HashMap[String, Integer](values.length * 2)
        var i = 0
        while (i < values.length) { m.put(values(i), i); i += 1 }
        m
      }
      val (gi, hi, si, ai) = (idx(genes), idx(haps), idx(snps), idx(alleles))
      val (hb, sb, ab) = (8, 8, 2)
      val packUdf = udf((g: String, h: String, sn: String, a: String) =>
        ((((gi.get(g).toLong << hb) | hi.get(h).toLong) << sb
          | si.get(sn).toLong) << ab) | ai.get(a).toLong)
      val packed = base.select(packUdf(col("gene_name"), col("haplotype_name"),
          col("snp_id"), col("allele")).as("p")).as[Long].collect()
      lap(s"packcollect n=${packed.length}")
      var s = 0L
      var i = 0
      while (i < packed.length) { s += packed(i); i += 1 }
      lap(s"decodeloop sum=$s")
    }
    spark.stop()
  }
}
