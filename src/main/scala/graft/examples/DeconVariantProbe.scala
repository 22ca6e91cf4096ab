package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontaminate A/B probe, re-pointed across rounds as the operator
  * evolved. Round 12: persisted gram index (then-A) vs ReusedExchange
  * (then-B) — B won 2×, the persist was dropped. Round 13: variant A is
  * the SHIPPED operator, now the row-local GramMatchStats shape (bench
  * fps inside a codegen expression, zero corpus exchange); variant B
  * preserves the round-12 winner — the shared (id, gram) repartition
  * exchange read by the size aggregate and the broadcast semi-join —
  * as the comparison baseline (the composed-chain ladder's dominant
  * stage: 9.0 GB shuffle / 125 s at 8M docs).
  *
  * Usage: sbt "runMain graft.examples.DeconVariantProbe [sizesCsv]"
  */
object DeconVariantProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000000, 2000000, 4000000))
    val wpd = 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Curation

    def corpus(n: Int): DataFrame = {
      val contentId = when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
        .otherwise(col("id"))
      spark.range(n.toLong).select(
          col("id").as("doc_id"),
          array_join(transform(sequence(lit(1), lit(wpd)),
            i => conv(pmod(xxhash64(contentId * lit(1000003L) + i),
              lit(60466176L)).cast("string"), 10, 36)), " ")
            .as("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    }

    /** Variant B: contaminationAgainst's exact plan, no gram persist. */
    def deconNoPersist(docs: DataFrame, bench: DataFrame): DataFrame = {
      val p = spark.sparkContext.defaultParallelism
      val benchGrams = bench
        .select(graft.functions.HashExpressions.shingleSet(col("text"), 6)
          .as("__sh"))
        .select(explode(col("__sh")).as("__gram"))
        .select(md5(col("__gram")).as("__fp"))
        .distinct()
      val docGrams = docs
        .select(col("doc_id"),
          graft.functions.HashExpressions.shingleSet(col("text"), 6)
            .as("__sh"))
        .repartition(p, col("doc_id"))
        .select(col("doc_id"), explode(col("__sh")).as("__gram"))
        .select(col("doc_id"), md5(col("__gram")).as("__fp"))
      val sizes = docGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val perDoc = docGrams
        .join(broadcast(benchGrams), Seq("__fp"), "left_semi")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("matched_grams"))
      val contaminated = docs.select(col("doc_id"))
        .join(sizes, Seq("doc_id"), "left")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("matched_grams"), lit(0L)) >= 1).as("contaminated"))
        .filter(col("contaminated"))
        .select("doc_id")
      docs.join(contaminated, Seq("doc_id"), "left_anti")
    }

    // clearCache between reps releases variant A's leaked gram cache;
    // the corpus re-persist runs OUTSIDE the timed region.
    def timedMin(reps: Int, prepare: () => Unit)(body: => Long): Double =
      (1 to reps).map { _ =>
        spark.catalog.clearCache()
        prepare()
        System.gc(); Thread.sleep(50)
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min

    // warmup (untimed)
    {
      val w = corpus(100000); w.count()
      Curation.decontaminate(w.filter(col("doc_id") >= 1000), "doc_id",
        "text", w.filter(col("doc_id") < 1000), "text", n = 6).count()
      deconNoPersist(w.filter(col("doc_id") >= 1000),
        w.filter(col("doc_id") < 1000)).count()
      w.unpersist(blocking = true)
      println("warmup done")
    }

    for (n <- sizes) {
      val docs = corpus(n)
      docs.count()
      val body = docs.filter(col("doc_id") >= 1000)
      val bench = docs.filter(col("doc_id") < 1000)
      val prep = () => { docs.persist(); docs.count(); () }
      val tA = timedMin(2, prep) {
        Curation.decontaminate(body, "doc_id", "text", bench, "text",
          n = 6).count()
      }
      val tB = timedMin(2, prep) {
        deconNoPersist(body, bench).count()
      }
      println(f"[$n%8d] A(row-local, shipped) $tA%8.2f s   B(shared-exchange) $tB%8.2f s   ${tB / tA}%.2fx")
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
