package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Water-filling mixture planner: hand-computed redistribution, infeasible
  * budgets, and degenerate sources.
  */
class SamplingPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-plan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def plan(rows: Seq[(String, Long, Double)], budget: Long) =
    Sampling.mixturePlan(rows.toDF("source", "tokens", "weight"),
        "source", "tokens", "weight", budget)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))))
      .toMap

  test("hand case: exhausted source's shortfall redistributes by weight") {
    val got = plan(Seq(("a", 100L, 0.5), ("b", 1000L, 0.3), ("c", 1000L, 0.2)),
      budget = 1000L)
    // Round 1: a capped at 100 (exhausted), b 300, c 200; 400 remains.
    // Round 2: b += 400*0.3/0.5 = 240 -> 540, c += 160 -> 360.
    assert(got("a") == ((100L, 100.0, Some(1.0), true)))
    assert(got("b") == ((1000L, 540.0, Some(0.54), false)))
    assert(got("c") == ((1000L, 360.0, Some(0.36), false)))
  }

  test("infeasible budget exhausts every source at capacity") {
    val got = plan(Seq(("a", 10L, 0.6), ("b", 20L, 0.4)), budget = 1000L)
    assert(got("a") == ((10L, 10.0, Some(1.0), true)))
    assert(got("b") == ((20L, 20.0, Some(1.0), true)))
  }

  test("zero-capacity source is exhausted from the start, rate NULL") {
    val got = plan(Seq(("a", 0L, 0.5), ("b", 100L, 0.5)), budget = 50L)
    assert(got("a") == ((0L, 0.0, None, true)))
    assert(got("b")._2 == 50.0 && !got("b")._4)
  }

  test("feasible mixture takes exactly the nominal split in round 1") {
    val got = plan(Seq(("a", 1000L, 0.7), ("b", 1000L, 0.3)), budget = 100L)
    assert(got("a")._2 == 70.0 && got("b")._2 == 30.0)
  }
}
