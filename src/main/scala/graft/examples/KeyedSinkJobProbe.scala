package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Deterministic job-level attribution for the keyed streaming sinks
  * (q46 exact-dedup update sink, q88 sequence-assembly merge sink): wall
  * time is host-noise-bound on this machine (the round-14 A/B showed the
  * 1-min control swinging 1.5× between paired runs), but the NUMBER of
  * Spark jobs a batch schedules and each job's internal time are
  * plan facts. Runs each sink smoke `reps` times on the given sf dir and
  * prints per-run wall, job count, and summed job time — diff these
  * between trees to attribute a protocol change honestly.
  *
  * Usage: sbt "runMain graft.examples.KeyedSinkJobProbe [sfDir] [reps]"
  */
object KeyedSinkJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/events.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val jobMillis = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobs.remove(j.jobId)
        jobCount.incrementAndGet()
        jobMillis.addAndGet(j.time - t0)
      }
    })
    def measured(label: String)(body: => Long): Unit = {
      // drain listener bus so prior work doesn't leak into the window
      Thread.sleep(300)
      jobCount.set(0); jobMillis.set(0)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$label%-8s wall=$wall%6.2f s  jobs=${jobCount.get}%3d  " +
        f"jobTime=${jobMillis.get / 1000.0}%6.2f s  rows=$rows")
    }

    for (r <- 1 to reps) {
      val b46 = java.nio.file.Files.createTempDirectory("jp-q46").toString
      measured(s"q46#$r") {
        graft.ops.Dedup.streamingExactGroupsUpdate(spark, sfDir,
          "documents.parquet", "doc_id", "text",
          sinkDir = s"$b46/sink", checkpointDir = s"$b46/ckpt", nBuckets = 8)
          .count()
      }
      val b88 = java.nio.file.Files.createTempDirectory("jp-q88").toString
      measured(s"q88#$r") {
        graft.ops.Curation.streamingAssembleSequences(
          graft.streaming.EventsStream.readEventsStream(spark, sfDir,
            "events.parquet"),
          "user_id", "ts", "event_id", "event_type", sep = ">",
          sinkDir = s"$b88/sink", checkpointDir = s"$b88/ckpt", nBuckets = 8)
          .count()
      }
    }

    // WARM-sink variants: the single-file testdata tables produce one
    // micro-batch (all fresh path); splitting the source into 4 files
    // with maxFilesPerTrigger=1 gives 1 fresh + 3 WARM batches — the
    // regime the round-15 batch-staging rewrite targets (one batch-plan
    // execution per warm batch instead of two).
    val split = java.nio.file.Files.createTempDirectory("jp-split").toString
    spark.read.parquet(s"$sfDir/documents.parquet").repartition(4)
      .write.parquet(s"$split/docs")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.repartition(4).write.parquet(s"$split/events")
    val evSchema = spark.read.parquet(s"$split/events").schema
    for (r <- 1 to reps) {
      val b46 = java.nio.file.Files.createTempDirectory("jp-q46w").toString
      measured(s"q46w#$r") {
        graft.ops.Dedup.streamingExactGroupsUpdate(spark, s"$split/docs",
          "*.parquet", "doc_id", "text",
          sinkDir = s"$b46/sink", checkpointDir = s"$b46/ckpt",
          nBuckets = 8, maxFilesPerTrigger = 1)
          .count()
      }
      val b88 = java.nio.file.Files.createTempDirectory("jp-q88w").toString
      measured(s"q88w#$r") {
        val stream = spark.readStream.schema(evSchema)
          .option("pathGlobFilter", "*.parquet")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$split/events")
        graft.ops.Curation.streamingAssembleSequences(stream,
          "user_id", "ts", "event_id", "event_type", sep = ">",
          sinkDir = s"$b88/sink", checkpointDir = s"$b88/ckpt", nBuckets = 8)
          .count()
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(split))
    spark.stop()
  }
}
