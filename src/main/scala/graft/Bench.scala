package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM/codegen/parquet-reader warmup: the alphabetically first
    // query otherwise absorbs all JIT + classloading cost (measured ~5 s
    // on q01 cold vs ~1 s warm at sf0.1).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query must surface in the bench JSON (as its exception
      // class), never be silently timed as a fast success.
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      val dt = (System.nanoTime() - t0) / 1e9
      // Frames persisted inside an operator (pipeline stage materialization)
      // would otherwise accumulate across queries and skew later timings.
      spark.catalog.clearCache()
      (name, dt, err)
    }
    // Keep the JSON line SHORT: the driver captures only the tail of the
    // run output, and a 73-query line with full names + 9-decimal values
    // overflows that capture (round-4 bench parsed as null). qNN keys +
    // millisecond precision keep the whole line well under the budget.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def short(name: String): String = name.split("_")(0)
    val qs = results.map { case (k, v, _) => s"\"" + short(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + short(k) + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
