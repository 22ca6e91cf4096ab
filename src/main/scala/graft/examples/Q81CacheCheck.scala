package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does the q81 batch body's state-append write actually read the persisted
  * shingle cache, or recompute the shingle plan? Prints the write-side plan
  * (InMemoryTableScan present or not) and times the write with and without
  * the persist materialized.
  */
object Q81CacheCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // mirror the batch body via the public batch API pieces
    val sets = docs.select(col("doc_id"),
      graft.functions.HashExpressions.shingleSet(
        lower(col("text")), 3).as("sh")).persist()
    sets.count() // materialize

    val withBucket = sets.withColumn("__bucket",
      graft.ops.KeyedState.bucketColumn(Seq("doc_id"), 32))
    val plan = withBucket.repartition(32, col("__bucket"))
      .queryExecution.executedPlan.toString
    println("== write-side plan contains InMemoryTableScan: " +
      plan.contains("InMemoryTableScan"))
    println(plan.linesIterator.take(12).mkString("\n"))

    val out = java.nio.file.Files.createTempDirectory("q81cc").toString
    try {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        withBucket.repartition(32, col("__bucket"))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"$out/run$r")
        println(f"   cached write  run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      sets.unpersist()
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        withBucket.repartition(32, col("__bucket"))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"$out/nc$r")
        println(f"   uncached write run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally // delete the scratch even when a write/count fails mid-run
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
