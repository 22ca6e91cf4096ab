package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class JsonLinesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-jsonl-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = graft.TestScratch.path("graft-jsonl")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("explicit-schema read; special characters survive the round trip") {
    val base = graft.TestScratch.dir("graft-jsonl-rt")
    import spark.implicits._
    val src = Seq((1L, "plain"), (2L, "tab\tand \"quotes\" and \\slash"),
      (3L, "unicode: naïve café 日本語")).toDF("id", "text")
    JsonLines.write(src, s"$base/out", shards = 2)
    val back = JsonLines.read(spark, s"$base/out", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == src.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // shard convention: exactly 2 part files
    assert(new java.io.File(s"$base/out").listFiles()
      .count(_.getName.startsWith("part-")) == 2)
  }

  test("malformed lines: FAILFAST raises, DROPMALFORMED skips") {
    val dir = writeLines(Seq(
      """{"id": 1, "text": "ok"}""",
      """this is not json""",
      """{"id": 2, "text": "also ok"}"""))
    val dropped = JsonLines.read(spark, dir, schema, failOnMalformed = false)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(1L, 2L))
    intercept[org.apache.spark.SparkException] {
      JsonLines.read(spark, dir, schema).collect()
    }
  }
}
