package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query medians over >=3 isolated repeats: a single sequential pass
    // contaminates per-query times with JIT warm-up and run order (8 of the
    // 11 apparent round-4->5 "regressions" were sub-second queries that had
    // merely moved position), making round-over-round comparison unjudgeable.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM/codegen/parquet-reader warmup: the alphabetically first
    // query otherwise absorbs all JIT + classloading cost (measured ~5 s
    // on q01 cold vs ~1 s warm at sf0.1).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.catalog.clearCache()
    // SPARK_GRAFT_BENCH_ONLY=q25,q46 restricts to a prefix-matched subset
    // (local iteration; the driver leaves it unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val runs = (1 to repeats).map { _ =>
        // Frames persisted inside an operator (pipeline stage
        // materialization, dedup checkpoints) must not leak into the next
        // repeat or the next query. clearCache only drops catalog-tracked
        // Dataset caches — localCheckpoint blocks (every iteration of
        // duplicateClusters/bpeTrainMerges) sit in BlockManager storage
        // until the driver GCs the RDD object, so across 124 queries they
        // accumulate gigabytes of dead storage and the storage-vs-execution
        // memory contention inflated checkpoint-heavy queries ~7x (q105:
        // 20.1 s in the r6 full suite vs 2.9 s run alone). Unpersisting
        // every still-registered RDD releases them deterministically.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        // A failed query must surface in the bench JSON (as its exception
        // class), never be silently timed as a fast success.
        val err = try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val ok = runs.collect { case (dt, None) => dt }.sorted
      val median = if (ok.isEmpty) 0.0 else ok(ok.size / 2)
      (name, median, runs.collectFirst { case (_, Some(e)) => e })
    }
    // Keep the JSON line SHORT: the driver captures only the tail of the
    // run output, and an 88-query line with full names + 9-decimal values
    // overflows that capture (round-4 bench parsed as null). qNN keys +
    // millisecond precision keep the whole line well under the budget.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def short(name: String): String = name.split("_")(0)
    val qs = results.map { case (k, v, _) => s"\"" + short(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + short(k) + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
