package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curves).
  *
  * At 100 TB the dominant cost of a selective query is the bytes the scan
  * cannot skip. A table range-partitioned on ONE column prunes perfectly on
  * that column and not at all on any other; interleaving the bits of two
  * scaled columns into a single Morton key and range-partitioning on THAT
  * gives every file a narrow min/max envelope in BOTH dimensions (each
  * halving of the key space halves each dimension alternately), so parquet
  * footer min/max statistics prune multi-predicate scans without any
  * secondary index.
  *
  * Everything here is exact integer arithmetic in plain Catalyst column
  * expressions (a static tree of shifts/masks/`div` — whole-stage codegen,
  * no UDF, engine-portable bit-for-bit): min-max scaling uses integral
  * `div`, never a float, so the layout an engine computes is reproducible
  * anywhere, including the DuckDB oracle replaying it.
  */
object Layout {

  /** Integral division (SQL `div`) — exact at any magnitude, unlike a
    * float divide + floor, which rounds above 2^53. */
  private def intDiv(x: Column, y: Column): Column =
    call_function("div", x, y)

  /** Morton-interleave two already-scaled non-negative ints (each in
    * `[0, 2^bits)`): bit `i` of `a` lands at position `2i+1`, bit `i` of
    * `b` at `2i`. A static `bits`-term OR tree of shift/mask expressions —
    * stays inside whole-stage codegen.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Inverse of [[interleaveBits]]: extract the scaled `a` (odd positions)
    * back out of a Morton key. `deinterleaveA(interleaveBits(a, b, n)) == a`
    * for in-range inputs (property-tested). */
  def deinterleaveA(z: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, 2 * i + 1).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** Extract the scaled `b` (even positions) back out of a Morton key. */
  def deinterleaveB(z: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, 2 * i).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** Append the Morton key `z` of `(colA, colB)` (long columns), min-max
    * scaled to `bits` bits each with integral arithmetic:
    * `((v - lo) * (2^bits - 1)) div max(hi - lo, 1)`.
    *
    * The bounds come from one tiny min/max aggregate cross-joined back as a
    * broadcast single row — declarative (no driver action), and at scale
    * the bounds row is computed once per layout job, not per partition.
    */
  def withZorderKey(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int = 8,
      zCol: String = "z"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val maxScaled = (1L << bits) - 1
    // `(v - lo) * maxScaled` wraps Long silently for wide-range columns
    // (epoch-nanos, snowflake ids — any span past ~2^63/maxScaled), and
    // `hi - lo` itself can wrap when the column spans more than half the
    // long range. Exact decimal(38,0) arithmetic handles that — but costs
    // ~7× on the hot path (object-based Decimal vs codegen long ops,
    // measured 0.34 s → 2.6 s on q130 at sf0.1). So the overflow test
    // runs ONCE per dimension in the 1-row bounds aggregate — span ×
    // maxScaled fits in Long ⇒ every per-row intermediate fits, since
    // 0 ≤ v − lo ≤ span — and each row reads a boolean to take the pure
    // long codegen path (the overwhelmingly common case) or the exact
    // decimal path. Both paths produce identical values wherever the long
    // path is safe, so the flag never changes results, only cost.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val safeCap = lit(Long.MaxValue).cast("decimal(38,0)")
    val bounds = df.agg(
        min(col(colA).cast("long")).as("__alo"),
        max(col(colA).cast("long")).as("__ahi"),
        min(col(colB).cast("long")).as("__blo"),
        max(col(colB).cast("long")).as("__bhi"))
      .withColumn("__asafe",
        (dec(col("__ahi")) - dec(col("__alo"))) * lit(maxScaled) <= safeCap)
      .withColumn("__bsafe",
        (dec(col("__bhi")) - dec(col("__blo"))) * lit(maxScaled) <= safeCap)
    def scaled(c: String, lo: String, hi: String, safe: String): Column =
      when(col(safe),
        intDiv((col(c).cast("long") - col(lo)) * lit(maxScaled),
          greatest(col(hi) - col(lo), lit(1L))).cast("long"))
        .otherwise(
          intDiv((dec(col(c).cast("long")) - dec(col(lo))) * lit(maxScaled),
            greatest(dec(col(hi)) - dec(col(lo)),
              lit(1L).cast("decimal(38,0)"))).cast("long"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__sa", scaled(colA, "__alo", "__ahi", "__asafe"))
      .withColumn("__sb", scaled(colB, "__blo", "__bhi", "__bsafe"))
      .withColumn(zCol, interleaveBits(col("__sa"), col("__sb"), bits))
      .drop("__alo", "__ahi", "__blo", "__bhi", "__asafe", "__bsafe",
        "__sa", "__sb")
  }

  /** Per-bucket layout audit for a Z-order clustering of `(colA, colB)`:
    * rows land in `nBuckets` equal-width ranges of the Morton key
    * (`bucket = (z * nBuckets) div 2^(2·bits)`) and the report shows each
    * bucket's row count and min/max envelope in BOTH source dimensions —
    * exactly the parquet footer statistics a scan would prune with. The
    * clustering claim is quantitative: with `nBuckets = 4^k`, every
    * bucket's span in EACH dimension is ≤ the global span / 2^k (a 1-D
    * sort gives span/nBuckets in one dimension and the FULL span in the
    * other).
    *
    * Plan shape: tiny bounds aggregate (broadcast row) → codegen integer
    * projection → one hash aggregate on the bucket id (map-side combined:
    * the shuffle carries O(nBuckets) partials per task, never rows).
    */
  def zorderLayoutReport(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int = 8,
      nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val keyed = withZorderKey(df, colA, colB, bits)
    // z reaches 2^(2·bits)-1, so z * nBuckets wraps Long once
    // (2^(2·bits)-1) * nBuckets passes Long.MaxValue — but both operands
    // are PARAMETERS, so the branch to the exact decimal form is decided
    // here, at plan-build time; the common case stays pure long codegen.
    val bucketExpr =
      if ((BigInt(2).pow(2 * bits) - 1) * nBuckets <= Long.MaxValue)
        intDiv(col("z") * lit(nBuckets.toLong), lit(1L << (2 * bits)))
      else
        intDiv(col("z").cast("decimal(38,0)") * lit(nBuckets.toLong),
          lit(1L << (2 * bits))).cast("long")
    keyed
      .withColumn("bucket", bucketExpr)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col(colA).cast("long")).as("min_a"),
        max(col(colA).cast("long")).as("max_a"),
        min(col(colB).cast("long")).as("min_b"),
        max(col(colB).cast("long")).as("max_b"))
      .withColumn("span_a", col("max_a") - col("min_a"))
      .withColumn("span_b", col("max_b") - col("min_b"))
  }

  /** Write `df` Z-order-clustered on `(colA, colB)`: range-partition on the
    * Morton key into `nBuckets` output files, sort within each partition by
    * the key (so row-group statistics inside a file are tight too), drop
    * the key, write parquet. Readers need nothing special — the layout IS
    * the index (footer min/max on the source columns).
    */
  def zorderWrite(
      df: DataFrame,
      dir: String,
      colA: String,
      colB: String,
      bits: Int = 8,
      nBuckets: Int = 16): Unit =
    withZorderKey(df, colA, colB, bits)
      .repartitionByRange(nBuckets, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(dir)
}
