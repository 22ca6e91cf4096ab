package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale ladder for the two operator families that had oracle +
  * differential coverage but no beyond-the-bench scale evidence (VERDICT
  * r14 #3): temporal joins (as-of with a ZIPF-hot key) and event
  * analytics (funnel / SCD2 / cohort at ~100× the sf0.1 bench volume).
  * Geometric rung ladder with per-stage wall AND shuffle-bytes deltas
  * (the ComposedChainScaleProbe pattern — bytes, not keys, predict the
  * single-box page-cache cliff; a stage whose time or bytes grows faster
  * than the rung ratio is super-linear and gets the q63 treatment).
  *
  * Skew design: user keys are drawn zipf-style — u = hash-uniform in
  * [0,1), user_id = floor(users * u^3) — so the hottest key holds ~4-5%
  * of all rows at any scale (u^3 concentrates mass near 0). The as-of
  * join's scale caveat is its per-key window sort: the hot key's rows
  * sort in ONE task, so the ladder measures whether that straggler bends
  * the slope before 8M rows. A uniform-key control at the top rung
  * separates skew cost from volume cost.
  *
  * Usage: sbt "runMain graft.examples.EventLadderProbe [sizesCsv] [users]"
  * defaults: 2000000,4000000,8000000 rows; 10000 users.
  */
object EventLadderProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2000000, 4000000, 8000000))
    val users = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{EventAnalytics, TemporalJoins}

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    // count() is NOT a safe work-forcer for every report shape: the
    // funnel report is a left join from a broadcast nSteps-row dimension
    // with unique keys, so Catalyst answers count() without touching the
    // event data at all (join elimination + pruning — measured 457 BYTES
    // of shuffle for a "2M-row" funnel). Checksumming every output column
    // forces full evaluation.
    def checksum(df: DataFrame): Long = {
      val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      h.agg(count(lit(1)).as("n"), sum(col("h"))).collect()(0).getLong(0)
    }
    def staged(label: String)(body: => Long): Unit = {
      Thread.sleep(300); shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"  $label%-22s ${wall}%7.2f s  shuffle=${shuffleBytes.get / 1e6}%9.1f MB  rows=$rows")
    }

    val base = 1700000000L
    val span = 30L * 24 * 3600
    // zipf-ish key: u uniform from hash, u^3 concentrates on low ids —
    // P(user 0) ≈ (1/users)^(1/3) cubed share ≈ users^(-1/3)… measured:
    // at 10k users the hottest key holds ~4.6% of rows, top-10 ~21%.
    def zipfKey(idCol: org.apache.spark.sql.Column) = {
      val u = pmod(xxhash64(idCol * lit(2654435761L)), lit(1000000L))
        .cast("double") / lit(1000000.0)
      floor(lit(users.toDouble) * u * u * u).cast("long")
    }
    def uniformKey(idCol: org.apache.spark.sql.Column) =
      pmod(xxhash64(idCol * lit(2654435761L)), lit(users.toLong))

    def facts(n: Long, key: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      spark.range(n).select(
          col("id").as("event_id"),
          key(col("id")).as("user_id"),
          timestamp_seconds(lit(base) +
            pmod(xxhash64(col("id") * lit(1000003L)), lit(span))).as("ts"),
          concat(lit("e"), pmod(col("id"), lit(4)).cast("string"))
            .as("event_type"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()

    // dimension updates: 20% of fact volume, same key distribution
    def dims(n: Long, key: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      spark.range(n / 5).select(
          key(col("id") * lit(7L) + lit(3L)).as("user_id"),
          timestamp_seconds(lit(base) +
            pmod(xxhash64(col("id") * lit(999983L)), lit(span))).as("dim_ts"),
          pmod(col("id"), lit(5)).as("plan_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()

    for (n <- sizes) {
      val f = facts(n.toLong, zipfKey); val d = dims(n.toLong, zipfKey)
      val fc = f.count(); d.count()
      val hot = f.groupBy("user_id").count().orderBy(desc("count"))
        .limit(1).collect()(0)
      println(s"== rung n=$n (zipf: hottest user ${hot.getLong(0)} holds " +
        f"${hot.getLong(1) * 100.0 / fc}%.1f%% of rows)")
      staged("asof_zipf") {
        TemporalJoins.asofJoin(f, "ts", d, "dim_ts", Seq("user_id"))
          .filter(col("plan_id").isNotNull).count()
      }
      staged("scd2_zipf") {
        TemporalJoins.scd2Build(
          f.withColumn("attr", pmod(col("event_id"), lit(7))),
          Seq("user_id"), "ts", "event_id", Seq("attr")).count()
      }
      staged("funnel_zipf") {
        checksum(EventAnalytics.funnelReport(f, "event_type", "ts",
          "event_id", "user_id", Seq("e0", "e1", "e2")))
      }
      staged("cohort_zipf") {
        EventAnalytics.cohortRetention(f, "ts", "user_id").count()
      }
      f.unpersist(); d.unpersist()
    }
    // uniform-key control at the top rung: the same volume without the
    // hot key isolates what the zipf skew itself costs each operator
    val n = sizes.max
    val f = facts(n.toLong, uniformKey); val d = dims(n.toLong, uniformKey)
    f.count(); d.count()
    println(s"== control n=$n (uniform keys)")
    staged("asof_uniform") {
      TemporalJoins.asofJoin(f, "ts", d, "dim_ts", Seq("user_id"))
        .filter(col("plan_id").isNotNull).count()
    }
    staged("scd2_uniform") {
      TemporalJoins.scd2Build(
        f.withColumn("attr", pmod(col("event_id"), lit(7))),
        Seq("user_id"), "ts", "event_id", Seq("attr")).count()
    }
    staged("funnel_uniform") {
      checksum(EventAnalytics.funnelReport(f, "event_type", "ts",
        "event_id", "user_id", Seq("e0", "e1", "e2")))
    }
    spark.stop()
  }
}
