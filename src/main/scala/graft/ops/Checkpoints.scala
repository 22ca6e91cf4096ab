package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation for iterative operators (label-propagation closure,
  * Lloyd refinement, BPE merge training), with explicit storage release.
  *
  * Two concerns every driver-side iteration loop has to handle:
  *
  *  1. '''Plan depth''': each iteration references the previous frame, so
  *     without truncation the logical plan grows per iteration — planning
  *     cost (and eventually driver memory just holding the plan) becomes
  *     the bottleneck, not data. [[truncate]] materializes the frame and
  *     replaces its plan with a leaf.
  *  2. '''Storage accumulation''': truncation parks the materialized rows
  *     in executor storage, and `spark.catalog.clearCache` does NOT track
  *     them — each superseded iteration would otherwise pin its blocks
  *     until the driver happens to GC the RDD object. For a bounded loop
  *     that's waste; for a long closure over a skewed edge list it's an
  *     executor OOM. [[release]] drops a superseded iteration's blocks
  *     deterministically.
  *
  * [[truncate]] picks the durability class from the session: when a
  * reliable checkpoint dir is configured (`sc.setCheckpointDir` — the
  * cluster posture, where executor loss must not kill a half-finished
  * index build), it uses `checkpoint()`; otherwise `localCheckpoint()`
  * (executor-storage, the right class for single-node/offline builds).
  */
private[graft] object Checkpoints {

  /** Materialize `df` and truncate its lineage to a leaf. Reliable
    * (checkpoint-dir) when the SparkContext has one set, local otherwise.
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Release the storage behind a [[truncate]]d frame once a later
    * iteration supersedes it. No-op for frames that are not checkpoint
    * leaves. Block-manager storage is dropped for local checkpoints; for
    * RELIABLE checkpoints the files are deleted too — Spark's context
    * cleaner does NOT delete reliable checkpoint data under default
    * config (`spark.cleaner.referenceTracking.cleanCheckpoints` is
    * false), so without this a thousand-iteration loop would fill the
    * checkpoint dir with one full frame copy per iteration.
    *
    * CONTRACT: a released frame must never be referenced again. A
    * checkpoint leaf has no lineage to recompute from — deleting its
    * files/blocks makes any later action on it (or on a plan built over
    * it) fail unrecoverably. Call sites therefore release a frame only
    * after the frame that replaces it is materialized AND every plan
    * still to be executed reads the replacement. The FINAL iteration's
    * frame is intentionally not released here (its rows are the result);
    * callers that fully consume a returned checkpointed frame may release
    * it themselves to reclaim the last copy.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      case _ => ()
    }
}
