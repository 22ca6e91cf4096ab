package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused timing for the q77.quality ladder cell (qualityFilter +
  * keep-filter + source join), at one corpus size — used to adjudicate
  * the round-13 codegen TextStats rewrite against the ladder's recorded
  * cells (8.96 s HOF+join at 2M; 20.6 s after the join fold exposed the
  * interpreted-projection eviction). Min-of-2, quiet machine.
  */
object QualityStageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Curation
    import graft.functions.TextFunctions
    val contentId = when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
        array_join(transform(sequence(lit(1), lit(50)),
          i => conv(pmod(xxhash64(contentId * lit(1000003L) + i),
            lit(60466176L)).cast("string"), 10, 36)), " ")
          .as("text"))
      .repartition(spark.sparkContext.defaultParallelism).persist()
    docs.count()
    def cell(): Long = Curation.qualityFilter(docs, "doc_id", "text",
        minStopwordRatio = 0.0, maxDupSegmentFrac = 0.95, separator = " ")
      .filter(col("keep"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "n_tokens").count()
    cell() // warmup
    val t = (1 to 2).map { _ =>
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime(); cell(); (System.nanoTime() - t0) / 1e9
    }.min
    println(f"q77.quality cell at $n docs: $t%.2f s")
    spark.stop()
  }
}
