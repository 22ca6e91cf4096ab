package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton-key round-trip, bucket envelope bounds, and the
  * clustered-write path.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("interleaveBits round-trips through deinterleave for random inputs") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.interleaveBits(col("a"), col("b"), 8))
      .withColumn("a2", Layout.deinterleaveA(col("z"), 8))
      .withColumn("b2", Layout.deinterleaveB(col("z"), 8))
    assert(df.filter(col("a2") =!= col("a") || col("b2") =!= col("b")).count() == 0)
    // Morton key stays inside 2*bits bits.
    assert(df.filter(col("z") < 0 || col("z") >= (1L << 16)).count() == 0)
  }

  test("interleaveBits: hand-computed example") {
    // a=0b101 (5) -> odd positions 5,3,1 -> 0b100010 (34)
    // b=0b011 (3) -> even positions 2,0  -> 0b000101 (5)
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 3)).as[Long].head()
    assert(got == (34L | 5L))
  }

  test("zorderLayoutReport: 4^k buckets bound each dimension's span to global/2^k") {
    // Uniform grid 64x64, 16 buckets (k=2): every bucket envelope must span
    // at most 1/4 of each dimension (a 1-D sort would leave one dimension
    // at full span).
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val rep = Layout.zorderLayoutReport(grid, "a", "b", bits = 6, nBuckets = 16)
      .collect()
    assert(rep.map(_.getAs[Long]("n")).sum == 64L * 64L)
    assert(rep.length == 16)
    rep.foreach { r =>
      assert(r.getAs[Long]("span_a") <= 63L / 4 + 1, r.toString)
      assert(r.getAs[Long]("span_b") <= 63L / 4 + 1, r.toString)
    }
  }

  test("withZorderKey: wide-range columns (epoch-nanos scale) stay exact, no overflow") {
    import spark.implicits._
    // span ~4.6e18: (v - lo) * 255 would wrap Long (silent garbage keys
    // before the decimal-scaling fix); both extremes and the midpoint
    // must land in order
    val wide = Seq((1L, Long.MinValue / 2, 0L), (2L, 0L, 0L),
      (3L, Long.MaxValue / 2, 0L)).toDF("id", "a", "b")
    val keyed = Layout.withZorderKey(wide, "a", "b", bits = 8)
      .orderBy("id").select("z").as[Long].collect().toSeq
    assert(keyed.forall(_ >= 0L), s"negative Morton keys: $keyed")
    assert(keyed == keyed.sorted, "z must be monotone in a for constant b")
    assert(keyed.distinct.size == 3)
    // report buckets stay in [0, nBuckets) at the top of the bits range
    val buckets = Layout.zorderLayoutReport(wide, "a", "b",
        bits = 31, nBuckets = 16)
      .select("bucket").as[Long].collect().toSeq
    assert(buckets.forall(b => b >= 0 && b < 16), s"bad buckets: $buckets")
  }

  test("withZorderKey: constant column degrades to 1-D ordering, no crash") {
    val df = (0L until 100L).map(i => (i, 42L)).toDF("a", "b")
    val keyed = Layout.withZorderKey(df, "a", "b", bits = 4)
    // b constant -> scaled b = 0 everywhere; z is monotone in a's scaled value.
    val rows = keyed.orderBy("a").select("z").as[Long].collect()
    assert(rows.zip(rows.tail).forall { case (x, y) => x <= y })
  }

  test("zorderWrite produces per-file envelopes that actually prune") {
    val dir = graft.TestScratch.dir("graft-zorder")
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    Layout.zorderWrite(grid, dir, "a", "b", bits = 6, nBuckets = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64L * 64L)
    // Per-file min/max envelope: each output file covers at most a quarter
    // of each dimension, so a point predicate touches at most 4/16 files.
    val perFile = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("a").as("la"), max("a").as("ha"), min("b").as("lb"), max("b").as("hb"))
      .collect()
    assert(perFile.length == 16)
    // Sampled range boundaries can straddle two Morton prefixes, so a file
    // may cover two adjacent quarters of one dimension — but never the full
    // span (which is what a 1-D sort leaves in its unsorted dimension).
    perFile.foreach { r =>
      assert(r.getAs[Long]("ha") - r.getAs[Long]("la") <= 63L / 2 + 1)
      assert(r.getAs[Long]("hb") - r.getAs[Long]("lb") <= 63L / 2 + 1)
    }
    val meanSpanA = perFile.map(r => r.getAs[Long]("ha") - r.getAs[Long]("la")).sum
      .toDouble / perFile.length
    assert(meanSpanA <= 24.0, s"mean span_a $meanSpanA")
  }
}
