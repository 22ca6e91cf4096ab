package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-unicode-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("NFC folds decomposed to composed; fingerprints align") {
    val df = Seq(
      (1L, "café"), // e + combining acute
      (2L, "caf\u00e9"),  // composed e-acute
      (3L, "plain ascii"))
      .toDF("id", "t")
      .select($"id", UnicodeExpressions.nfc($"t").as("n"))
      .withColumn("fp", md5($"n"))
    val rows = df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows(1L)._1 == "caf\u00e9" && rows(1L) == rows(2L))
    assert(rows(3L)._1 == "plain ascii")
  }

  test("NFKC folds ligatures and width; NFC leaves them") {
    val df = Seq((1L, "\uFB01n \uFF41\uFF42")) // fi ligature + fullwidth ab
      .toDF("id", "t")
      .select(
        UnicodeExpressions.nfc($"t").as("nfc"),
        UnicodeExpressions.nfkc($"t").as("nfkc"))
    val r = df.head()
    assert(r.getString(0) == "\uFB01n \uFF41\uFF42") // NFC: unchanged
    assert(r.getString(1) == "fin ab")               // NFKC: folded
  }

  test("SQL surface: unicode_normalize registered form") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT unicode_normalize('cafe\\u0301', 'NFC') AS n")
      .head().getString(0)
    assert(got == "caf\u00e9")
  }
}
