package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark late-data audit: hand case, randomized differential test
  * against a naive global replay, and batch-width invariance (the
  * distributed prefix scan must be exact, not approximate).
  */
class LateDataAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-late-data-audit-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("arr", "tie", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))

  private def audit(rows: Seq[(Long, Long, Long)], delayUs: Long, batchUs: Long) =
    EventAnalytics.lateDataAudit(df(rows), "arr", "tie", "ts", delayUs, batchUs)
      .select(unix_micros(col("window_start")).as("w"), col("n"), col("n_late"),
        col("late_frac"), col("max_lag_us"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap

  private def naive(rows: Seq[(Long, Long, Long)], delayUs: Long) = {
    val sorted = rows.sortBy(e => (e._1, e._2))
    var mx = Long.MinValue
    var have = false
    val flagged = sorted.map { case (_, _, tsu) =>
      val late = have && tsu < mx - delayUs
      val lag = if (have && mx > tsu) Some(mx - tsu) else None
      if (!have || tsu > mx) { mx = tsu; have = true }
      (tsu, late, lag)
    }
    flagged.groupBy { case (tsu, _, _) => math.floorDiv(tsu, H) * H }
      .map { case (w, evs) =>
        val nLate = evs.count(_._2).toLong
        val lags = evs.flatMap(_._3)
        w -> ((evs.size.toLong, nLate,
          BigDecimal(nLate.toDouble / evs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (lags.isEmpty) None else Some(lags.max)))
      }
  }

  test("hand case: one straggler behind the frontier") {
    // arrival order: t=0h00, t=0h50 (frontier), then a straggler stamped
    // 0h10 (40 min behind) -> late under a 30-min watermark, on-time under 1h.
    val rows = Seq(
      (1L, 1L, 0L),
      (2L, 2L, 50L * 60L * 1000000L),
      (3L, 3L, 10L * 60L * 1000000L))
    val strict = audit(rows, 30L * 60L * 1000000L, 60L * 1000000L)
    assert(strict(0L) == ((3L, 1L, 0.333333, Some(40L * 60L * 1000000L))))
    val loose = audit(rows, 3600L * 1000000L, 60L * 1000000L)
    assert(loose(0L) == ((3L, 0L, 0.0, Some(40L * 60L * 1000000L))))
  }

  test("lateDataAudit ≡ naive global replay (randomized)") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 300L).map { i =>
        val tsu = rnd.nextInt(5 * 3600).toLong * 1000000L
        val arr = tsu + rnd.nextInt(1800).toLong * 1000000L // ≤30 min lag
        (arr, i, tsu)
      }
      val delay = (rnd.nextInt(20) + 1).toLong * 60L * 1000000L
      val got = audit(rows, delay, 60L * 1000000L)
      val want = naive(rows, delay)
      assert(got == want, s"seed $seed delay $delay")
    }
  }

  test("batch width never changes the result (prefix decomposition is exact)") {
    val rnd = new scala.util.Random(99)
    val rows = (1L to 500L).map { i =>
      val tsu = rnd.nextInt(4 * 3600).toLong * 1000000L
      (tsu + rnd.nextInt(3600).toLong * 1000000L, i, tsu)
    }
    val delay = 600L * 1000000L
    val a = audit(rows, delay, 1000000L)          // 1 s batches
    val b = audit(rows, delay, 3600L * 1000000L)  // 1 h batches
    val c = audit(rows, delay, 1L << 62)          // one giant batch
    assert(a == b && b == c)
  }
}
