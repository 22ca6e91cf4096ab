package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed cases for the event-analytics family (funnel, cohort
  * retention, SCD2 build) — the q122–q124 operators, whose driver gates
  * are SQL-oracle replays; these specs pin the semantics a SQL mismatch
  * would only reveal indirectly.
  */
class EventAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("EventAnalyticsSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.map { case (u, t, et, id) => (u, ts(t), et, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
  }

  // ---- funnel ----

  test("funnel: strictly-after chain, partial conversion, zero-reach step") {
    // u1 completes all three; u2 clicks BEFORE signing up (click must not
    // count) and never purchases; u3 signs up only.
    val ev = events(
      (1L, "2024-01-01 10:00:00", "signup", 1),
      (1L, "2024-01-01 10:05:00", "click", 2),
      (1L, "2024-01-01 10:10:00", "purchase", 3),
      (2L, "2024-01-02 09:00:00", "click", 4),
      (2L, "2024-01-02 10:00:00", "signup", 5),
      (3L, "2024-01-03 08:00:00", "signup", 6),
      (3L, "2024-01-03 07:00:00", "noise", 7))
    val out = EventAnalytics.funnelReport(ev, "event_type", "ts", "event_id",
        "user_id", Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "signup", 3L, 1.0),
      (2, "click", 1L, 0.333333),
      (3, "purchase", 1L, 0.333333)))
  }

  test("funnel default path is the collection-free min-chain: no object " +
      "aggregation in the plan, one raw shuffle reused by every pass") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", "signup", 1),
      (1L, "2024-01-01 10:05:00", "click", 2),
      (1L, "2024-01-01 10:10:00", "purchase", 3))
    val plan = EventAnalytics.funnelReport(ev, "event_type", "ts", "event_id",
        "user_id", Seq("signup", "click", "purchase"))
      .queryExecution.executedPlan.toString.toLowerCase
    // chained min aggregates stay inside whole-stage codegen — no
    // priority-queue object aggregation, no per-user collection
    assert(!plan.contains("objecthashaggregate"),
      s"expected codegen min-chain, got object aggregation:\n$plan")
    assert(!plan.contains("collect_top_k") && !plan.contains("collect_list"))
    // the raw (user, ts, type) exchange executes ONCE for all s passes —
    // asserted on a non-trivial frame (tiny fixtures can collapse before
    // reuse applies)
    import org.apache.spark.sql.functions.{col, concat, lit, pmod, timestamp_seconds}
    val big = spark.range(100000L).select(
      col("id").as("event_id"),
      pmod(col("id"), lit(100L)).as("user_id"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
      concat(lit("e"), pmod(col("id"), lit(4)).cast("string"))
        .as("event_type"))
    val bigRep = EventAnalytics.funnelReport(big, "event_type", "ts",
      "event_id", "user_id", Seq("e0", "e1", "e2"))
    bigRep.collect()
    val bigPlan = bigRep.queryExecution.executedPlan.toString.toLowerCase
    assert(bigPlan.contains("reusedexchange"),
      s"expected the pass exchanges to dedup via ReuseExchange:\n$bigPlan")
  }

  test("funnel: explicit maxEventsPerUser selects the bounded top-k " +
      "collection path, and the cap binds") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", "signup", 1),
      (1L, "2024-01-01 10:05:00", "click", 2),
      (1L, "2024-01-01 10:10:00", "purchase", 3))
    val plan = EventAnalytics.funnelReport(ev, "event_type", "ts", "event_id",
        "user_id", Seq("signup", "click", "purchase"), maxEventsPerUser = 100)
      .queryExecution.executedPlan.toString.toLowerCase
    // bounded priority-queue aggregate, NOT collect_list-then-slice: a
    // pathological key must cost O(cap) buffer at every aggregation level
    assert(plan.contains("collect_top_k"), s"expected CollectTopK:\n$plan")
    assert(!plan.contains("collect_list"), "unbounded collect_list in plan")
    // the cap keeps the EARLIEST events: capping at 2 drops the purchase
    val capped = EventAnalytics.funnelReport(ev, "event_type", "ts", "event_id",
        "user_id", Seq("signup", "click", "purchase"), maxEventsPerUser = 2)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(capped == Seq((1, 1L), (2, 1L), (3, 0L)))
  }

  test("funnel: min-chain ≡ collected path on interleaved multi-user events") {
    // dense interleavings with repeats, stalls, same-ts collisions
    val rows = for {
      u <- 1L to 40L; i <- 0 until 12
    } yield (u, f"2024-01-01 ${(i * 7 + u) % 24}%02d:${(u * 13 + i * 31) % 60}%02d:00",
      Seq("signup", "click", "purchase", "noise")(((u + i * 3) % 4).toInt),
      u * 100 + i)
    val ev = events(rows: _*)
    def report(cap: Int) = EventAnalytics.funnelReport(ev, "event_type",
        "ts", "event_id", "user_id", Seq("signup", "click", "purchase"),
        maxEventsPerUser = cap)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(report(0) == report(10000),
      "min-chain and an unbinding cap must produce identical funnels")
  }

  test("funnel: NULL user ids are excluded identically by both paths") {
    import spark.implicits._
    // u1 converts fully; two unattributed (NULL-user) events would reach
    // step 2 if NULLs grouped as an ordinary key. Both paths must drop
    // them, so n_users agrees with the SQL oracle's join semantics.
    val ev = Seq[(Option[Long], String, String, Long)](
      (Some(1L), "2024-01-01 10:00:00", "signup", 1),
      (Some(1L), "2024-01-01 10:05:00", "click", 2),
      (None, "2024-01-02 09:00:00", "signup", 3),
      (None, "2024-01-02 09:30:00", "click", 4))
      .map { case (u, t, et, id) => (u, ts(t), et, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    def report(cap: Int) = EventAnalytics.funnelReport(ev, "event_type",
        "ts", "event_id", "user_id", Seq("signup", "click"),
        maxEventsPerUser = cap)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(report(0) === Seq((1, 1L), (2, 1L)),
      "min-chain must not count NULL-user events")
    assert(report(10000) === report(0),
      "collected path must exclude NULL users like the min-chain path")
  }

  test("funnel: equal-timestamp events advance in tie order, not time order") {
    // signup and click at the SAME instant: the chain requires strictly
    // later, so the click at the same ts must NOT advance step 2.
    val ev = events(
      (1L, "2024-01-01 10:00:00", "signup", 1),
      (1L, "2024-01-01 10:00:00", "click", 2))
    val out = EventAnalytics.funnelReport(ev, "event_type", "ts", "event_id",
        "user_id", Seq("signup", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 1L), (2, 0L)))
  }

  // ---- cohort retention ----

  test("cohort retention: Monday cohorts, aligned integer week offsets") {
    // u1 first active week of Mon 2024-01-01, returns two weeks later;
    // u2 cohorts the same week, never returns; u3 cohorts the next week.
    val ev = events(
      (1L, "2024-01-02 10:00:00", "view", 1),  // week 2024-01-01
      (1L, "2024-01-16 10:00:00", "view", 2),  // week 2024-01-15, offset 2
      (2L, "2024-01-03 10:00:00", "view", 3),  // week 2024-01-01
      (3L, "2024-01-10 10:00:00", "view", 4))  // week 2024-01-08
    val out = EventAnalytics.cohortRetention(ev, "ts", "user_id")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("cohort retention: weeks are DATE-typed") {
    val ev = events((1L, "2024-01-02 10:00:00", "view", 1))
    val schema = EventAnalytics.cohortRetention(ev, "ts", "user_id").schema
    assert(schema("cohort_week").dataType ===
      org.apache.spark.sql.types.DateType)
  }

  // ---- SCD2 ----

  private def dimEvents(rows: (Long, String, Long, Long)*) = {
    import spark.implicits._
    rows.map { case (u, t, id, tier) => (u, ts(t), id, tier) }
      .toDF("user_id", "ts", "event_id", "tier")
  }

  test("scd2: unchanged attributes collapse; valid_to chains; versions count") {
    val src = dimEvents(
      (1L, "2024-01-01 00:00:00", 1, 10),
      (1L, "2024-01-02 00:00:00", 2, 10),  // unchanged -> collapses into v1
      (1L, "2024-01-03 00:00:00", 3, 20),  // change -> v2
      (1L, "2024-01-04 00:00:00", 4, 10),  // change back -> v3 (not merged)
      (2L, "2024-01-01 00:00:00", 5, 5))
    val out = TemporalJoins.scd2Build(src, Seq("user_id"), "ts", "event_id",
        Seq("tier"))
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString),
        r.getInt(4)))
    assert(out.toSeq === Seq(
      (1L, 10L, "2024-01-01 00:00:00.0", Some("2024-01-03 00:00:00.0"), 1),
      (1L, 20L, "2024-01-03 00:00:00.0", Some("2024-01-04 00:00:00.0"), 2),
      (1L, 10L, "2024-01-04 00:00:00.0", None, 3),
      (2L, 5L, "2024-01-01 00:00:00.0", None, 1)))
  }

  test("scd2: equal-timestamp updates resolve by the tie column") {
    val src = dimEvents(
      (1L, "2024-01-01 00:00:00", 2, 20),
      (1L, "2024-01-01 00:00:00", 1, 10))
    val out = TemporalJoins.scd2Build(src, Seq("user_id"), "ts", "event_id",
        Seq("tier"))
      .orderBy("version").collect().map(r => (r.getLong(1), r.getInt(4)))
    // event_id 1 (tier 10) sorts first, event_id 2 (tier 20) becomes v2.
    assert(out.toSeq === Seq((10L, 1), (20L, 2)))
  }

  test("scd2 plans exactly one shuffle (windows share the per-key ordering)") {
    // AQE wraps the plan until execution; disable it so the static plan
    // exposes its exchanges (the PlanShapeSpec discipline).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val src = dimEvents((1L, "2024-01-01 00:00:00", 1, 10))
      val plan = TemporalJoins.scd2Build(src, Seq("user_id"), "ts", "event_id",
        Seq("tier")).queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size === 1,
        s"expected exactly 1 Exchange, got ${exchanges.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
