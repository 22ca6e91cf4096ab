package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Streaming-state SCALE probe: drive the three stateful event operators
  * (funnel, cohort, SCD2) over 1M synthetic events with a heavily skewed
  * user distribution and measure the state store via
  * `StreamingQueryProgress.stateOperators` — rows and bytes, not doc
  * claims. The documented bounds under test:
  *
  *  - funnelStream: exactly ONE state row per user seen, three scalars
  *    wide — rows == distinct users regardless of events (the hot user
  *    carries 100k+ events and still holds one row);
  *  - cohortStream: one row per user, payload bounded by weeks OBSERVED
  *    (≤ 9 weeks here however many events a user has);
  *  - scd2Stream: one row per key, (json, long, int) payload independent
  *    of that key's change count.
  *
  * Run: sbt "runMain graft.examples.StreamingStateProbe" — prints one
  * line per operator: state rows, state bytes, bytes/row; asserts the
  * row bounds exactly and the bytes/row within a generous store-overhead
  * envelope. Results recorded in PLANS.md ("Round-8: streaming state
  * bounds, measured").
  */
object StreamingStateProbe {

  private val N = 1000000L
  private val Users = 50000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-streaming-state-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-state-probe")
    val eventsDir = s"$dir/events"
    // 1M events over ~58 days; user skew: every 10th event belongs to user
    // 0 (a 100k-event hot key), the rest spread over 50k users. Four
    // event types cycle so funnel steps and SCD2 attribute changes both
    // fire constantly.
    spark.range(N)
      .select(
        col("id").as("event_id"),
        timestamp_seconds(lit(1700000000L) + col("id") * 5).as("ts"),
        when(col("id") % 10 === 0, 0L).otherwise(col("id") % Users).as("user_id"),
        // type index mixes in (id div Users) so a user's 20 events cycle
        // through ALL types — plain id % 4 would give each user a single
        // constant type (id ≡ user mod 50000 and 50000 % 4 == 0).
        element_at(array(lit("visit"), lit("signup"), lit("purchase"), lit("upgrade")),
          ((col("id") + col("id").divide(Users).cast("long")) % 4 + 1).cast("int"))
          .as("event_type"),
        (col("id") % 97).cast("double").as("value"),
        concat(lit("p"), (col("id") % 7).cast("string")).as("props"))
      .repartition(4)
      .write.mode("overwrite").parquet(eventsDir)

    val distinctUsers = spark.read.parquet(eventsDir)
      .select("user_id").distinct().count()

    def measure(name: String, out: DataFrame, outputMode: String,
        expectRows: Long, maxBytesPerRow: Double): Unit = {
      val sink = s"probe_${name}"
      val q = out.writeStream.outputMode(outputMode)
        .format("memory").queryName(sink)
        .option("checkpointLocation", s"$dir/ckpt_$name")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val stateOps = q.recentProgress.flatMap(_.stateOperators)
      val rows = if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max
      val bytes = if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max
      val perRow = if (rows == 0) 0.0 else bytes.toDouble / rows
      println(f"[state-probe] $name%-8s state_rows=$rows%d state_bytes=$bytes%d bytes_per_row=$perRow%.1f (expect rows=$expectRows, cap $maxBytesPerRow%.0f B/row)")
      assert(rows == expectRows,
        s"$name: state rows $rows != expected $expectRows — state is NOT bounded by keys")
      assert(perRow <= maxBytesPerRow,
        s"$name: $perRow bytes/row exceeds the documented envelope $maxBytesPerRow")
      spark.catalog.dropTempView(sink)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // maxFilesPerTrigger=2 → two micro-batches over the 4 files, so state
    // survival across batches is exercised, not just one-shot build-up.
    def stream(): DataFrame = {
      val schema = spark.read.parquet(eventsDir).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "2")
        .parquet(eventsDir)
    }

    // Funnel: 3 scalars/user. HDFSBackedStateStore overhead (key row,
    // value row, versioned map entry) dominates the 20 data bytes — the
    // envelope says "hundreds of bytes, NOT event-proportional": the hot
    // user has 100k events; event-proportional state would be megabytes
    // per row.
    measure("funnel",
      EventsStream.funnelStream(spark, stream(), Seq("visit", "signup", "purchase")),
      "update", distinctUsers, 600.0)

    // Cohort: payload = Monday-epoch-day ints for weeks OBSERVED (58 days
    // → ≤ 9 ints) — bounded by calendar, not by the hot user's event count.
    measure("cohort", EventsStream.cohortStream(spark, stream()),
      "update", distinctUsers, 900.0)

    // SCD2: one (attrs json, valid_from, version) per key.
    measure("scd2",
      EventsStream.scd2Stream(spark, stream().withColumn("tier",
        substring(col("props"), 1, 2)), Seq("tier")),
      "update", distinctUsers, 700.0)

    println("[state-probe] all bounds hold")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
