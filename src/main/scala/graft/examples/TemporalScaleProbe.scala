package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the batch temporal joins: a deterministic synthetic
  * event stream (hash-derived timestamps over `users` keys — no RNG) at
  * 10×–400× the sf0.1 events row count. Facts are 80% of rows, dimension
  * versions 20%; intervals are 2-hour windows. Prints wall times per
  * operator; PLANS.md cites a 1M→4M run (the slope, not the absolute,
  * is the check: as-of is one shuffle + per-key sort, range/interval
  * joins are equi joins with bounded bucket replication, so all three
  * should scale near-linearly until the per-key sort dominates).
  *
  * Usage: sbt "runMain graft.examples.TemporalScaleProbe [nRows] [users]"
  */
object TemporalScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val users = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TemporalJoins

    // one month of events, hash-spread; key = id mod users
    val span = 30L * 24 * 3600
    val base = 1700000000L
    val events = spark.range(n.toLong).select(
        col("id"),
        pmod(col("id"), lit(users.toLong)).as("user_id"),
        timestamp_seconds(lit(base) +
          pmod(xxhash64(col("id") * lit(1000003L)), lit(span))).as("ts"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    events.count()
    println(s"events: $n rows, $users users")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      events.persist(); events.count()
      r
    }

    val facts = events.filter(pmod(col("id"), lit(5)) =!= 0)
      .select(col("user_id"), col("ts").as("f_ts"), col("id").as("fact_id"))
    val dims = events.filter(pmod(col("id"), lit(5)) === 0)
      // unique per (user, ts): drop hash-collision duplicates
      .groupBy("user_id", "ts").agg(max("id").as("dim_id"))
      .select(col("user_id"), col("ts").as("d_ts"), col("dim_id"))

    timed(s"asofJoin: ${n * 4 / 5} facts vs ${n / 5} dim versions") {
      TemporalJoins.asofJoin(facts, "f_ts", dims, "d_ts", Seq("user_id"))
        .filter(col("dim_id").isNotNull).count()
    }
    val intervals = dims.select(col("user_id"), col("d_ts").as("start_ts"),
      (col("d_ts") + expr("INTERVAL 2 HOURS")).as("end_ts"), col("dim_id"))
    timed("rangeJoin: facts in 2h dim windows (hour buckets)") {
      TemporalJoins.rangeJoin(facts, "f_ts", intervals,
        "start_ts", "end_ts", Seq("user_id"), bucketSeconds = 3600L).count()
    }
    val factsIv = facts.select(col("user_id"), col("f_ts").as("a_start"),
      (col("f_ts") + expr("INTERVAL 1 HOURS")).as("a_end"), col("fact_id"))
    timed("intervalJoin: 1h fact windows x 2h dim windows") {
      TemporalJoins.intervalJoin(factsIv, "a_start", "a_end", intervals,
        "start_ts", "end_ts", Seq("user_id"), bucketSeconds = 3600L).count()
    }
    spark.stop()
  }
}
