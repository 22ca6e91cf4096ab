package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch temporal joins Spark lacks as built-ins: backward AS-OF join and
  * point-in-interval range join — the two classic "custom operator"
  * gaps for event/feature pipelines (join each fact to the latest prior
  * dimension version; join each event into its enclosing window).
  *
  * Both are built from compositions the optimizer handles well rather than
  * range-predicate joins (which Catalyst can only execute as a broadcast
  * nested loop or cartesian + filter — quadratic at corpus scale):
  *
  *  - as-of: tag + union + per-key forward fill. ONE shuffle on the key,
  *    one per-key ordered window — n log n in each key's rows, no
  *    replication, no range explosion. This is the canonical distributed
  *    as-of shape.
  *  - range: interval bucketization. Intervals replicate to the fixed-width
  *    buckets they cover, points compute their single bucket, and the join
  *    becomes EQUI on (keys, bucket) + a residual bounds filter — a plain
  *    shuffled hash join at any scale. `bucketSeconds` sizes replication:
  *    pick it near the typical interval length so each interval lands in
  *    O(1) buckets.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, the single latest right row
    * with `right.timeCol <= left.timeCol` within the same `keyCols` group
    * (left rows with no prior right row keep nulls — left-join semantics,
    * matching an `ASOF LEFT JOIN`). `tolerance` (seconds, optional) nulls
    * the match back out when the right row is older than
    * `left time − tolerance`.
    *
    * Contract: apart from `keyCols`, the two frames' column names must be
    * disjoint (rename the right side first — it keeps its names in the
    * output), and right rows should be unique per (keys, time): sort ties
    * among duplicate right timestamps have no defined winner (the same
    * caveat ASOF JOIN implementations carry).
    *
    * Scale shape: union the tagged sides, ONE shuffle on `keyCols`, and a
    * running `last(_, ignoreNulls)` per key ordered by (time, side) —
    * right rows sort before left rows at equal timestamps, so equality
    * matches inclusively. No row replication; per-task state is one
    * window frame.
    */
  def asofJoin(
      left: DataFrame,
      lTimeCol: String,
      right: DataFrame,
      rTimeCol: String,
      keyCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    // The left time column rides as __t and is re-aliased on output;
    // keeping it in the payload list would duplicate the column name.
    val lCols = left.columns.filterNot(c => keyCols.contains(c) || c == lTimeCol)
    val rCols = right.columns.filterNot(keyCols.contains)
    // lTimeCol re-enters the output under its own name, so a right column
    // sharing it is just as much a clash as a payload collision.
    val clash = (lCols.toSet + lTimeCol) intersect rCols.toSet
    require(clash.isEmpty, s"rename right-side columns first: clash on $clash")
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(lTimeCol).as("__t"), lit(1).as("__side")) ++
        lCols.map(col) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(rTimeCol).as("__t"), lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rCols.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          lCols.map(col) ++
          rCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
    val out = toleranceSeconds match {
      case None => filled
      case Some(tol) =>
        // A match older than the tolerance horizon reverts to no-match.
        // Microsecond arithmetic: unix_timestamp truncates to whole
        // seconds, which would keep a match up to ~1s past the horizon
        // on sub-second-precision timestamps.
        val stale = col(rTimeCol).isNotNull &&
          (unix_micros(col("__t")) - unix_micros(col(rTimeCol))) >
            tol * 1000000L
        filled.select(
          (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
            lCols.map(col) ++
            rCols.map(c => when(stale, lit(null).cast(right.schema(c).dataType))
              .otherwise(col(c)).as(c)): _*)
    }
    out.select(
      keyCols.map(col) ++ Seq(col("__t").as(lTimeCol)) ++
        lCols.map(col) ++ rCols.map(col): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair within the
    * same `keyCols` group with `startCol <= point.timeCol < endCol` —
    * inner-join semantics, one output row per enclosing interval (a point
    * inside two overlapping intervals matches both).
    *
    * Contract: apart from `keyCols`, column names must be disjoint (the
    * right/interval side keeps its names in the output). Intervals must
    * have `start <= end`.
    *
    * Scale shape: each interval explodes to the `bucketSeconds`-wide epoch
    * buckets it covers (`ceil(length / bucket) + 1` rows — size the bucket
    * near the typical interval length); each point computes its single
    * bucket in the scan. The join is then EQUI on (keys, bucket) with the
    * exact bounds as a residual filter — a shuffled hash join, never a
    * BroadcastNestedLoopJoin/cartesian, and each matching pair meets in
    * exactly one bucket (the point's), so no post-join dedup is needed.
    */
  def rangeJoin(
      points: DataFrame,
      pTimeCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val pCols = points.columns.filterNot(keyCols.contains)
    val iCols = intervals.columns.filterNot(keyCols.contains)
    val clash = pCols.toSet intersect iCols.toSet
    require(clash.isEmpty, s"rename interval-side columns first: clash on $clash")
    def bucketOf(t: Column): Column = floor(unix_timestamp(t) / bucketSeconds)
    val p = points.withColumn("__bucket", bucketOf(col(pTimeCol)))
    val i = intervals.withColumn("__bucket", explode(sequence(
      bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, keyCols :+ "__bucket")
      .filter(col(pTimeCol) >= col(startCol) && col(pTimeCol) < col(endCol))
      .drop("__bucket")
  }

  /** SCD2 history build: collapse a per-key change-event stream into
    * type-2 slowly-changing-dimension intervals — one row per VERSION of
    * the key's attributes, with `valid_from`/`valid_to` half-open bounds
    * (`valid_to` null = current version) and a 1-based `version` ordinal.
    * Consecutive events whose `attrCols` are unchanged collapse into the
    * earlier version (true change detection, not one-row-per-event), so
    * the output is exactly the table a [[asofJoin]] or [[rangeJoin]]
    * probe expects on its dimension side.
    *
    * Determinism: events order by `(timeCol, tieCol)` within each key, so
    * equal-timestamp updates have a defined winner. Attribute comparison
    * is null-safe (`<=>` on the attr struct).
    *
    * Scale shape: ONE shuffle on `keyCols`; the change-detect lag window,
    * the valid-to lead window, and the version ordinal all run over that
    * same per-key ordering (the filter between them preserves the
    * partitioning, so no second Exchange), and per-task window state is
    * one frame row. No joins, no replication.
    */
  def scd2Build(
      events: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2Build needs key and attribute columns")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    val changed = events
      .withColumn("__chg", !(attrs <=> lag(attrs, 1).over(byKey)))
      // lag is null on each key's first row, so __chg is true there too
      // (null-safe <=> makes the comparison itself never-null).
      .filter(col("__chg"))
    changed.select(
      keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(timeCol).as("valid_from"),
        lead(col(timeCol), 1).over(byKey).as("valid_to"),
        row_number().over(byKey).as("version")): _*)
  }

  /** Interval-overlap join: every (left, right) interval pair within the
    * same `keyCols` group whose half-open spans intersect
    * (`lStart < rEnd AND rStart < lEnd`) — inner-join semantics, one row
    * per overlapping pair.
    *
    * Contract mirrors [[rangeJoin]]: apart from `keyCols`, column names
    * must be disjoint; intervals must have `start <= end`.
    *
    * Scale shape: BOTH sides explode to their covered
    * `bucketSeconds`-buckets and meet in an equi join on (keys, bucket);
    * the overlap predicate is a residual filter, and each overlapping pair
    * is kept exactly once — in the bucket containing the overlap's START
    * (`greatest` of the two starts), which both coverage ranges provably
    * contain. A plain shuffled hash join with bounded replication
    * (`interval length / bucket + 1` rows per side), never a nested loop,
    * and no post-join distinct.
    */
  def intervalJoin(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      keyCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val lCols = left.columns.filterNot(keyCols.contains)
    val rCols = right.columns.filterNot(keyCols.contains)
    val clash = lCols.toSet intersect rCols.toSet
    require(clash.isEmpty, s"rename one side's columns first: clash on $clash")
    def bucketOf(t: Column): Column = floor(unix_timestamp(t) / bucketSeconds)
    val l = left.withColumn("__bucket", explode(sequence(
      bucketOf(col(lStartCol)), bucketOf(col(lEndCol)))))
    val r = right.withColumn("__bucket", explode(sequence(
      bucketOf(col(rStartCol)), bucketOf(col(rEndCol)))))
    l.join(r, keyCols :+ "__bucket")
      // non-empty intersection of half-open spans: max(start) < min(end).
      // (Equivalent to lStart < rEnd && rStart < lEnd for non-empty
      // intervals, but also correct for a zero-length [t, t) — an empty
      // span strictly inside the other interval intersects NOTHING.)
      .filter(greatest(col(lStartCol), col(rStartCol)) <
        least(col(lEndCol), col(rEndCol)))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(lStartCol), col(rStartCol))))
      .drop("__bucket")
  }
}
