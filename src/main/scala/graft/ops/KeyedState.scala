package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The keyed streaming-state discipline shared by every foreachBatch sink
  * that accumulates partitioned parquet state ([[Dedup]]'s band index and
  * shingle store, [[Similarity.streamingIvfIngest]]'s cell index):
  *
  *   - state lives in `path/<partCol>=<value>/` partition dirs, keyed so
  *     a probe by key prunes the scan to its own partitions;
  *   - each batch appends ONE file per touched partition (an explicit
  *     repartition count before the dynamic-partition write — a bare
  *     `repartition(col)` re-plans under AQE and measured 3× slower);
  *   - any touched partition that accumulates more than `maxFiles`
  *     parquet files is rewritten in place (dynamic partition overwrite
  *     of just those dirs), so the sink's file listing stays
  *     O(partitions) however many batches arrive — at one appended file
  *     per partition per batch the rewrite fires at most once per
  *     `maxFiles` batches per partition, bounding the amortized cost.
  *
  * Compaction decisions are driver fs LISTINGS (≤ one `listStatus` per
  * candidate partition), never data reads; nothing fires until some
  * partition crosses the threshold.
  */
object KeyedState {

  /** Hash bucket for key columns: a pure function of the key, so a probe
    * by key touches exactly one bucket and bucket-pruned joins are
    * exactly equivalent to full-state joins. */
  def bucketColumn(keys: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")

  /** Append into `path/<partCol>=<v>/` dirs, one file per touched
    * partition value. Empty frames are skipped: a zero-row partitioned
    * write creates no files, leaving a dir the next read cannot infer a
    * schema from. `numTasks` bounds the write's task count (each
    * partition value still lands wholly in one task, so files per batch
    * = touched partition values). */
  def appendPartitioned(df: DataFrame, path: String, partCol: String,
      numTasks: Int): Unit =
    if (!df.isEmpty)
      df.repartition(numTasks, col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(path)

  /** Rewrite any of the given partition values whose parquet-file count
    * exceeds `maxFiles` down to one file each — a dynamic partition
    * overwrite of just those dirs (the localCheckpoint breaks the
    * read-own-path cycle). */
  def compactPartitions(spark: SparkSession, path: String, partCol: String,
      values: Seq[Any], maxFiles: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oversized = values.filter { v =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/$partCol=$v")
      fs.exists(dir) && fs.listStatus(dir)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles
    }
    if (oversized.nonEmpty) {
      val rows = spark.read.parquet(path)
        .filter(col(partCol).isin(oversized: _*))
        .repartition(oversized.size, col(partCol))
        .localCheckpoint(true)
      try rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(path)
      finally rows.unpersist()
    }
  }

  /** Distinct partition values present in a one-column frame — bounded
    * by the partition count, the same driver-side footprint as
    * [[Upsert.upsertKeyedParquet]]'s affected-bucket collect. */
  def touchedValues(values: DataFrame): Seq[Any] =
    values.distinct().collect().map(_.get(0)).toSeq

  /** Rewrite a FLAT (unpartitioned) append sink down to `numFiles` files
    * once its parquet-file count exceeds `maxFiles` — for append-only
    * OUTPUT dirs (e.g. a streaming query's accumulated result rows) that
    * gain one file per batch and are read in full at the end, where the
    * keyed layouts above don't apply. The decision is one driver
    * `listStatus`; the rewrite stages to a sibling temp dir and swaps via
    * two renames (the brief gap is only visible to a concurrent reader —
    * a foreachBatch caller is serial by construction). */
  def compactFlat(spark: SparkSession, path: String, maxFiles: Int,
      numFiles: Int = 8): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val nFiles = fs.listStatus(p)
      .count(_.getPath.getName.endsWith(".parquet"))
    if (nFiles <= maxFiles) return
    val rows = spark.read.parquet(path).localCheckpoint(true)
    try {
      val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
      fs.delete(tmp, true)
      // clamp so the rewrite always lands back under the threshold
      rows.coalesce(math.max(1, math.min(numFiles, maxFiles)))
        .write.parquet(tmp.toString)
      fs.delete(p, true)
      fs.rename(tmp, p)
    } finally rows.unpersist()
  }
}
