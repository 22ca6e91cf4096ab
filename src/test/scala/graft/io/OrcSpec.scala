package graft.io

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class OrcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-orc-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("explicit-schema round trip; shard convention") {
    val base = graft.TestScratch.dir("graft-orc-rt")
    import spark.implicits._
    val src = Seq((1L, "plain"), (2L, "tab\tand \"quotes\" and \\slash"),
      (3L, "unicode: naïve café 日本語")).toDF("id", "text")
    Orc.write(src, s"$base/out", shards = 2)
    val back = Orc.read(spark, s"$base/out", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == src.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(new java.io.File(s"$base/out").listFiles()
      .count(_.getName.startsWith("part-")) == 2)
  }

  test("scan properties: filters push into the ORC scan, columns prune") {
    val base = graft.TestScratch.dir("graft-orc-scan")
    import spark.implicits._
    val src = (1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    Orc.write(src, s"$base/out")
    val q = Orc.read(spark, s"$base/out", schema)
      .filter(col("id") > 990L).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,990)]"),
      s"filter did not reach the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"text column not pruned from the ORC scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == (991L to 1000L).toSet)
  }
}
