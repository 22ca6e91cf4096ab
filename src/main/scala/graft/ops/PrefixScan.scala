package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix scans (running aggregates) over a total
  * `(orderCol, tieCol)` order — the primitive behind event-time frontiers
  * (running max) and budget cutoffs (running sum), computed without ever
  * sorting the data on one partition.
  *
  * The decomposition: rows bucket by a caller-supplied expression that is
  * NON-DECREASING along the scan order (a value-range micro-batch of a
  * timestamp, a hex prefix of an md5 key). A window PARTITIONED by bucket
  * computes the within-bucket exclusive prefix; the cross-bucket carry-in
  * folds over the O(#buckets) bucket-summary frame — the only ordered pass
  * is over bucket summaries (metadata scale), never over rows. Because
  * earlier buckets hold strictly earlier rows, `combine(within-bucket
  * prefix, previous-buckets total)` IS the global exclusive prefix; both
  * max and sum are associative, so the result is EXACT (bucket-width
  * invariance is spec-asserted).
  *
  * Bucket-count sizing is the one dial: #buckets bounds the ordered
  * summary fold (thousands to ~1M is fine), while per-bucket row count
  * bounds window-partition size — pick the bucket expression so both stay
  * sane at the target scale.
  */
object PrefixScan {

  /** Exclusive running MAX of `valueCol` over `(orderCol, tieCol)` order.
    * The first row of the scan has no predecessor and gets NULL. Appends
    * `outCol`; input columns pass through unchanged. */
  def runningMaxExclusive(
      df: DataFrame,
      orderCol: String,
      tieCol: String,
      valueCol: String,
      bucket: Column,
      outCol: String): DataFrame =
    running(df, orderCol, tieCol, valueCol, bucket, outCol, isSum = false)

  /** Exclusive running SUM of `valueCol` (numeric) over `(orderCol,
    * tieCol)` order. The first row gets 0, not NULL (a cumulative budget
    * before any row is zero). Appends `outCol`. */
  def runningSumExclusive(
      df: DataFrame,
      orderCol: String,
      tieCol: String,
      valueCol: String,
      bucket: Column,
      outCol: String): DataFrame =
    running(df, orderCol, tieCol, valueCol, bucket, outCol, isSum = true)

  private def running(
      df: DataFrame,
      orderCol: String,
      tieCol: String,
      valueCol: String,
      bucket: Column,
      outCol: String,
      isSum: Boolean): DataFrame = {
    def agg(c: Column): Column = if (isSum) sum(c) else max(c)
    val original = df.columns.toSeq
    val b = df.withColumn("__psb", bucket)
    val w = Window.partitionBy(col("__psb"))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scanned = b.withColumn("__inb", agg(col(valueCol)).over(w))
    // Exclusive carry-in per bucket: ordered fold over O(#buckets) rows.
    val bw = Window.orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val summary = b.groupBy(col("__psb"))
      .agg(agg(col(valueCol)).as("__bagg"))
      .withColumn("__prev", agg(col("__bagg")).over(bw))
      .select(col("__psb"), col("__prev"))
    val combined = scanned.join(broadcast(summary), Seq("__psb"))
      .withColumn(outCol,
        if (isSum) coalesce(col("__inb"), lit(0L)) + coalesce(col("__prev"), lit(0L))
        // greatest skips NULLs; NULL only when the row is first overall.
        else greatest(col("__inb"), col("__prev")))
    combined.select((original :+ outCol).map(col): _*)
  }
}
