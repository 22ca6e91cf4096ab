package graft.examples

import org.apache.spark.sql.SparkSession

/** Where does a streaming smoke's above-floor time go? Runs the q140
  * sliding-window smoke and the q88 assembly smoke with progress
  * instrumentation and prints each micro-batch's durationMs breakdown
  * (addBatch / getBatch / queryPlanning / walCommit / commitOffsets) plus
  * state-operator commit times — the measurement behind the round-9
  * q140/q88 cost-floor adjudication in PLANS.md.
  */
object StreamingCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.read.parquet(s"$sfDir/events.parquet").count()

    def report(label: String)(run: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      val q = run
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"== $label wall=${"%.2f".format(wall)}s")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} planning=${d.get("queryPlanning")} " +
          s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"  state: rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
        }
      }
      q.stop()
    }

    import graft.streaming.EventsStream
    // Each mode twice in one JVM: run 1 of whichever mode goes first also
    // pays the streaming-path classload/JIT, so only run-2 numbers are
    // mode-comparable.
    var i = 0
    for (run <- 1 to 2; mode <- Seq("complete", "update"); parts <- Seq(32, 8, 1)) {
      i += 1
      // A streaming query pins its state-partition count from
      // spark.sql.shuffle.partitions at FIRST start; vary it per query to
      // measure the per-store commit overhead (32 stores for 14k state
      // rows is the oversizing hypothesis).
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try report(s"q140 sliding $mode-mode parts=$parts run$run") {
        EventsStream.slidingCounts(EventsStream.readEventsStream(spark, sfDir))
          .writeStream.outputMode(mode).format("memory")
          .queryName(s"probe_sliding_$i").start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    // batch twin for the data-cost baseline
    val tb = System.nanoTime()
    EventsStream.slidingCounts(EventsStream.readEvents(spark, s"$sfDir/events.parquet")).count()
    println(s"== q138 batch twin wall=${"%.2f".format((System.nanoTime() - tb) / 1e9)}s")

    // q88 shape: stateful assembly into a keyed merge sink
    val base = java.nio.file.Files.createTempDirectory("graft-cost-probe").toString
    val t88 = System.nanoTime()
    val df = graft.ops.Curation.streamingAssembleSequences(
      EventsStream.readEventsStream(spark, sfDir, "events.parquet"),
      "user_id", "ts", "event_id", "event_type", sep = ">",
      sinkDir = s"$base/store", checkpointDir = s"$base/ckpt")
    val n = df.count()
    println(s"== q88 assembly wall=${"%.2f".format((System.nanoTime() - t88) / 1e9)}s rows=$n")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
