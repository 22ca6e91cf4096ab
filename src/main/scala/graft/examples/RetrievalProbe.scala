package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the retrieval stack (BM25 / RRF / MMR) with per-stage
  * listener output — the tool that caught q107's single-task tokenize
  * stage (an under-split input file serialized the whole scoring pipeline
  * onto one thread; fixed with the conditional repartition barrier in
  * [[graft.ops.Retrieval.bm25TopK]], 5.8 s → 1.3 s at sf0.1).
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    val queries = Seq((0L, "spark window agg"), (1L, "customer query table"),
      (2L, "vector merge stream"), (3L, "slow scan filter"))
      .toDF("query_id", "query_text")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val d = (i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)) / 1000.0
          if (d >= 0.5)
            stages.add(f"SLOW stage=${i.stageId} tasks=${i.numTasks} dur=$d%.2f s")
        }
      })
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "query_text", 10).count()
      println(f"[probe] rep$rep bm25 rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Thread.sleep(500)
    stages.forEach(x => println(s"[probe] $x"))
    println("[probe] (no SLOW lines above = every stage parallelized and sub-500ms)")
  }
}
