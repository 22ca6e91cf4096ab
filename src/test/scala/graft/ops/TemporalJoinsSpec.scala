package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived and differential scenarios for the batch temporal joins:
  * backward as-of (union + forward fill) and bucketized range join.
  */
class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-temporal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2Build and sessionizeBatch are shuffle-FREE over bucketed events") {
    // The 100 TB layout: events stored hash-bucketed and sorted by the
    // user key. The scan then reports HashPartitioning(user_id), the
    // per-key windows' distribution is already satisfied, and the ONE
    // shuffle these operators normally pay disappears entirely — state
    // proof that they compose with bucketed storage, not just AQE.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = graft.TestScratch.path("graft-ev-bkt")
      val ev = (1 to 200).map { i =>
        (i.toLong, (i % 7).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"),
          "view", (i % 40).toDouble)
      }.toDF("event_id", "user_id", "ts", "event_type", "value")
      ev.write.format("parquet")
        .option("path", s"$root/events_bucketed")
        .bucketBy(4, "user_id").sortBy("user_id", "ts")
        .mode("overwrite").saveAsTable("graft_events_bucketed_spec")
      val bucketed = spark.table("graft_events_bucketed_spec")
        .withColumn("tier", floor(col("value") / 10).cast("long"))

      val scd2Plan = TemporalJoins.scd2Build(bucketed, Seq("user_id"), "ts",
        "event_id", Seq("tier")).queryExecution.executedPlan.toString
      assert(!scd2Plan.contains("Exchange"),
        s"unexpected shuffle in SCD2 over bucketed events: $scd2Plan")

      val sessPlan = graft.streaming.EventsStream.sessionizeBatch(bucketed)
        .queryExecution.executedPlan.toString
      assert(!sessPlan.contains("Exchange"),
        s"unexpected shuffle in sessionize over bucketed events: $sessPlan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS graft_events_bucketed_spec")
    }
  }

  test("asofJoin: latest prior match, equal-timestamp inclusivity, no-prior nulls") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:00:20"), 102.0),
      (2L, ts("2024-01-01 10:00:05"), 50.0)
    ).toDF("user_id", "q_ts", "quote")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:10"), "equal"), // == quote 101 (inclusive)
      (1L, ts("2024-01-01 10:00:15"), "mid"),   // latest prior = 101
      (1L, ts("2024-01-01 10:00:25"), "after"), // latest prior = 102
      (2L, ts("2024-01-01 10:00:01"), "early"), // no prior quote for key 2
      (3L, ts("2024-01-01 10:00:30"), "nokey")  // key never quoted
    ).toDF("user_id", "t_ts", "tag")
    val got = TemporalJoins.asofJoin(trades, "t_ts", quotes, "q_ts", Seq("user_id"))
      .select("tag", "quote")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(got == Set(
      ("equal", Some(101.0)), ("mid", Some(101.0)), ("after", Some(102.0)),
      ("early", None), ("nokey", None)))
  }

  test("asofJoin tolerance: stale matches revert to null") {
    val dims = Seq((1L, ts("2024-01-01 00:00:00"), "v1"))
      .toDF("user_id", "d_ts", "version")
    val facts = Seq(
      (1L, ts("2024-01-01 00:30:00"), "fresh"),  // 1800 s after v1
      (1L, ts("2024-01-01 02:00:00"), "stale")   // 7200 s after v1
    ).toDF("user_id", "f_ts", "tag")
    val got = TemporalJoins.asofJoin(facts, "f_ts", dims, "d_ts", Seq("user_id"),
        toleranceSeconds = Some(3600L))
      .select("tag", "version")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("fresh", Some("v1")), ("stale", None)))
  }

  test("asofJoin: right column sharing the left time column's name is rejected") {
    val dims = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")))
      .toDF("user_id", "d_ts", "f_ts") // payload column named like left time
    val facts = Seq((1L, ts("2024-01-01 00:30:00")))
      .toDF("user_id", "f_ts")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(facts, "f_ts", dims, "d_ts", Seq("user_id"))
    }
    assert(e.getMessage.contains("f_ts")) // named in the clash error,
    // not a silent duplicate output column
  }

  test("asofJoin tolerance is microsecond-exact at the horizon") {
    val dims = Seq((1L, ts("2024-01-01 00:00:00"), "v1"))
      .toDF("user_id", "d_ts", "version")
    // 3600.5 s after v1: a second-truncating lag reads 3600 and would
    // wrongly keep the match at tolerance 3600
    val facts = Seq((1L, ts("2024-01-01 01:00:00.5"), "just_over"))
      .toDF("user_id", "f_ts", "tag")
    val got = TemporalJoins.asofJoin(facts, "f_ts", dims, "d_ts", Seq("user_id"),
        toleranceSeconds = Some(3600L))
      .select("version").collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(None))
  }

  test("intervalJoin: a zero-length interval intersects nothing") {
    // [t, t) is EMPTY even when t sits strictly inside the other span
    val l = Seq((1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), "z"))
      .toDF("k", "l_start", "l_end", "l_tag")
    val r = Seq((1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00"), "w"))
      .toDF("k", "r_start", "r_end", "r_tag")
    assert(TemporalJoins.intervalJoin(l, "l_start", "l_end",
      r, "r_start", "r_end", Seq("k"), bucketSeconds = 3600).count() == 0)
    // while a one-microsecond span inside it DOES intersect
    val l2 = Seq((1L, ts("2024-01-01 12:00:00"),
        ts("2024-01-01 12:00:00.000001"), "u"))
      .toDF("k", "l_start", "l_end", "l_tag")
    assert(TemporalJoins.intervalJoin(l2, "l_start", "l_end",
      r, "r_start", "r_end", Seq("k"), bucketSeconds = 3600).count() == 1)
  }

  test("asofJoin differential: equals the brute-force latest-prior computation") {
    // deterministic pseudo-random fixture over 5 keys
    val left = (1L to 200L).map(i =>
      (i % 5, ts(f"2024-01-01 00:${(i * 7) % 60}%02d:${(i * 13) % 60}%02d"), i))
      .toDF("k", "lt", "lid")
    val right = (1L to 60L).map(i =>
      (i % 5, ts(f"2024-01-01 00:${(i * 11) % 60}%02d:${(i * 29) % 60}%02d"), i * 10))
      .toDF("k", "rt", "rv")
      // unique per (key, time): keep the max payload among collisions
      .groupBy("k", "rt").agg(max("rv").as("rv"))
    val got = TemporalJoins.asofJoin(left, "lt", right, "rt", Seq("k"))
      .select("lid", "rv")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // brute force: max-rt right row per left with rt <= lt
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.rt") <= col("l.lt"), "left")
      .groupBy(col("l.lid").as("lid"), col("l.lt").as("lt"), col("l.k").as("k"))
      .agg(expr("max_by(r.rv, r.rt)").as("rv"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got == naive)
    assert(got.size == 200 && got.values.exists(_ >= 0) && got.values.exists(_ == -1L))
  }

  test("rangeJoin: bounds semantics and overlapping-interval multi-match") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at-start"),   // == w1 start: included
      (1L, ts("2024-01-01 10:59:59"), "inside"),
      (1L, ts("2024-01-01 11:00:00"), "at-end"),     // == w1 end: excluded
      (1L, ts("2024-01-01 10:30:00"), "overlap"),    // inside w1 AND w2
      (2L, ts("2024-01-01 10:30:00"), "wrong-key")
    ).toDF("k", "p_ts", "tag")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w1"),
      (1L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00"), "w2")
    ).toDF("k", "start_ts", "end_ts", "w")
    val got = TemporalJoins.rangeJoin(points, "p_ts", intervals,
        "start_ts", "end_ts", Seq("k"), bucketSeconds = 600L)
      .select("tag", "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("at-start", "w1"), ("inside", "w1"), ("overlap", "w1"), ("overlap", "w2")))
  }

  test("intervalJoin: overlap semantics, exactly-once pairs, no nested-loop") {
    val a = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "a1"),
      (1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00"), "a2"),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "a3")
    ).toDF("k", "a_start", "a_end", "a")
    val b = Seq(
      (1L, ts("2024-01-01 11:30:00"), ts("2024-01-01 13:30:00"), "b1"), // a1 & a2
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), "b2"), // touches a1's end: NO overlap (half-open)
      (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:01"), "b3"), // 1s overlap with a1
      (2L, ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00"), "b4")  // wrong time for a3
    ).toDF("k", "b_start", "b_end", "b")
    // a long interval spanning many buckets pairs with a long interval
    // exactly once — collect as a LIST to catch duplicate emissions
    val got = TemporalJoins.intervalJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", Seq("k"), bucketSeconds = 600L)
      .select("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got == List(("a1", "b1"), ("a1", "b3"), ("a2", "b1")))
  }

  test("intervalJoin differential: equals the predicate join on a dense fixture") {
    val a = (1L to 120L).map { i =>
      val h = (i * 3) % 20
      (i % 5, ts(f"2024-01-01 $h%02d:${(i * 7) % 60}%02d:00"),
        ts(f"2024-01-01 ${h + 3}%02d:${(i * 7) % 60}%02d:00"), i)
    }.toDF("k", "a_start", "a_end", "aid")
    val b = (1L to 80L).map { i =>
      val h = (i * 5) % 21
      (i % 5, ts(f"2024-01-01 $h%02d:${(i * 13) % 60}%02d:00"),
        ts(f"2024-01-01 ${h + 2}%02d:${(i * 13) % 60}%02d:00"), i)
    }.toDF("k", "b_start", "b_end", "bid")
    val got = TemporalJoins.intervalJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", Seq("k"), bucketSeconds = 1800L)
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    val naive = a.join(b, Seq("k"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(got == naive && got.nonEmpty)
    // exactly-once: the list form equals its deduplicated self
    assert(got == got.distinct)
  }

  test("rangeJoin differential + plan: equals the predicate join, no nested-loop") {
    val points = (1L to 300L).map(i =>
      (i % 7, ts(f"2024-01-01 ${(i * 3) % 24}%02d:${(i * 17) % 60}%02d:00"), i))
      .toDF("k", "p_ts", "pid")
    val intervals = (1L to 40L).map { i =>
      val h = (i * 5) % 22
      (i % 7, ts(f"2024-01-01 $h%02d:00:00"), ts(f"2024-01-01 ${h + 2}%02d:00:00"), i)
    }.toDF("k", "start_ts", "end_ts", "iid")
    val bucketed = TemporalJoins.rangeJoin(points, "p_ts", intervals,
      "start_ts", "end_ts", Seq("k"), bucketSeconds = 1800L)
    val got = bucketed.select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("p_ts") >= col("start_ts") && col("p_ts") < col("end_ts"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to a nested-loop plan:\n$plan")
  }
}
