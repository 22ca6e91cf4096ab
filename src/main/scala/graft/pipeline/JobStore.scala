package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Job-scoped stage-table storage.
  *
  * The reference materializes every stage into MySQL tables keyed by
  * `job_id`, and re-running a job deletes its prior rows first
  * (`Pipeline.groovy:554-576` — idempotent overwrite-by-job). The
  * Spark-native equivalent: stage tables are parquet datasets partitioned by
  * `job_id`, written with dynamic partition overwrite — re-running job N
  * replaces exactly partition `job_id=N` and leaves other jobs untouched.
  *
  * Partitioning by job_id also gives partition pruning on every job-scoped
  * read (the reference threads `job_id = :job_id` into every stage query;
  * here the scan skips other jobs' files entirely).
  */
final class JobStore(root: String) {

  private def path(table: String): String = s"$root/$table"

  /** Write (or re-write) one job's rows of a stage table. */
  def writeJob(df: DataFrame, table: String, jobId: Long): Unit = {
    val spark = df.sparkSession
    val withJob =
      if (df.columns.contains("job_id")) df
      else df.withColumn("job_id", lit(jobId))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    withJob
      .filter(col("job_id") === jobId)
      .write
      .partitionBy("job_id")
      .mode(SaveMode.Overwrite)
      .parquet(path(table))
  }

  /** Read a stage table; `jobId` prunes to one partition. The partition
    * column comes back as long regardless of partition-value inference.
    */
  def read(spark: SparkSession, table: String, jobId: Option[Long] = None): DataFrame = {
    val df = spark.read.parquet(path(table))
      .withColumn("job_id", col("job_id").cast("long"))
    jobId.map(id => df.filter(col("job_id") === id)).getOrElse(df)
  }

  /** Persist every stage frame of a finished job. */
  def writeAll(stages: Map[String, DataFrame], jobId: Long): Unit =
    stages.foreach { case (alias, df) =>
      Schemas.defaultTables.get(alias).foreach(table => writeJob(df, table, jobId))
    }
}
