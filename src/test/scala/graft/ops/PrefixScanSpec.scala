package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed exclusive prefix scans: differential against a naive sorted
  * replay, bucket-width invariance, and the exact budget-prefix selection
  * built on the sum scan.
  */
class PrefixScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-prefix-scan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("runningSum/MaxExclusive ≡ naive sorted replay, any bucket width") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 200L).map(i =>
        (rnd.nextInt(1000).toLong, i, rnd.nextInt(100).toLong))
      val df = rows.toDF("o", "tie", "v")
      Seq(1L, 37L, 100000L).foreach { width =>
        val bucket = floor(col("o") / lit(width))
        val gotSum = PrefixScan.runningSumExclusive(df, "o", "tie", "v", bucket, "c")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
        val gotMax = PrefixScan.runningMaxExclusive(df, "o", "tie", "v", bucket, "m")
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
        var cum = 0L
        var mx = Option.empty[Long]
        rows.sortBy(r => (r._1, r._2)).foreach { case (o, tie, v) =>
          assert(gotSum((o, tie)) == cum, s"sum seed=$seed width=$width at ($o,$tie)")
          assert(gotMax((o, tie)) == mx, s"max seed=$seed width=$width at ($o,$tie)")
          cum += v
          mx = Some(mx.fold(v)(math.max(_, v)))
        }
      }
    }
  }

  test("exactBudgetPrefix: minimal-overshoot prefix in md5 order") {
    val docs = (1L to 100L).map(i => (i, s"doc $i ${"w " * (i % 7).toInt}"))
      .toDF("doc_id", "text")
    val nTok = graft.functions.TextFunctions.tokenCount(col("text"))
    val budget = 120L
    val sel = Sampling.exactBudgetPrefix(docs, "doc_id", nTok, budget)
      .orderBy("cum_before").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = sel.map(_._2).sum
    // Crossed the budget, and removing the last admitted row would not.
    assert(total >= budget)
    assert(total - sel.last._2 < budget)
    // cum_before is consistent: each row's cum equals the sum of its
    // predecessors, and admission is exactly cum_before < budget.
    sel.foldLeft(0L) { case (acc, (_, nt, cb)) =>
      assert(cb == acc); assert(cb < budget); acc + nt
    }
    // A larger budget EXTENDS the prefix (no reshuffling).
    val sel2 = Sampling.exactBudgetPrefix(docs, "doc_id", nTok, budget * 2)
      .orderBy("cum_before").collect().map(_.getLong(0))
    assert(sel2.take(sel.length).toSeq == sel.map(_._1).toSeq)
    assert(sel2.length > sel.length)
  }
}
