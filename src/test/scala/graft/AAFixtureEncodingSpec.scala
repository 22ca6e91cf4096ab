package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-encoding CANARY — named to sort (and so run) first.
  *
  * The driver-generated events fixture has shipped with three different
  * physical timestamp encodings across rounds (INT64 nanos, TIMESTAMP_NTZ
  * micros, UTC-adjusted TIMESTAMP), and the footer-probing normalization in
  * [[graft.streaming.EventsStream.readEvents]] is load-bearing for every
  * event-analytics oracle. A FOURTH encoding must fail HERE, loudly, naming
  * what was found — not as downstream oracle hash noise spread over a dozen
  * queries.
  */
class AAFixtureEncodingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fixture-canary")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("an events fixture exists to canary") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/events.parquet found")
  }

  for (dir <- sfDirs) {
    test(s"events ts encoding at $dir is a known one and normalizes sanely") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      val known = Set[DataType](LongType, TimestampNTZType, TimestampType)
      assert(known.contains(rawType),
        s"UNRECOGNIZED events ts encoding at $dir: parquet footer reads as " +
          s"$rawType — a fourth fixture encoding has shipped; teach " +
          "EventsStream.readEvents/readEventsStream to decode it")

      val norm = graft.streaming.EventsStream.readEvents(spark, s"$dir/events.parquet")
      assert(norm.schema("ts").dataType === TimestampType,
        s"normalization produced ${norm.schema("ts").dataType}, not TimestampType")
      // A mis-decode is orders of magnitude off (nanos read as micros →
      // year ~52xxx; micros read as nanos → 1970), so a coarse year range
      // is a sharp detector.
      val yrRow = norm.selectExpr("min(year(ts)) as lo", "max(year(ts)) as hi").head()
      val (lo, hi) = (yrRow.getInt(0), yrRow.getInt(1))
      assert(lo >= 1990 && hi <= 2100,
        s"decoded events ts years span [$lo, $hi] at $dir (raw encoding " +
          s"$rawType) — the decode for this encoding is wrong by a unit factor")
    }
  }
}
