package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job-by-job attribution for q81's streaming near-dedup batch: the
  * round-14 cost probe showed a bimodal addBatch (2.6 s vs 5.6 s within
  * one JVM), which a wall clock cannot explain. This probe prints every
  * Spark job the batch schedules — id, duration, first stage name — plus
  * per-run GC time, so an episodic slow sample attributes itself to a
  * specific job (or to GC) instead of to narrative.
  *
  * Usage: sbt "runMain graft.examples.Q81JobsProbe [sfDir] [reps]"
  */
object Q81JobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    case class J(id: Int, t0: Long, var t1: Long = -1,
        var stage: String = "", var tasks: Int = 0, var taskMs: Long = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    // exact stage→job attribution: the job-start event carries its stage
    // ids, so a completed stage looks up its owning job directly —
    // correct even with overlapping jobs or SQL subexecutions (the old
    // most-recent-open-job heuristic misattributed those)
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[J]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.stage = e.stageInfos.map(_.name.takeWhile(_ != '\n').take(48))
          .mkString(" | ").take(120)
        jobs.put(e.jobId, j); order.add(j)
        e.stageIds.foreach(sid => stageToJob.put(sid, j))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageToJob.get(e.stageInfo.stageId)
        if (j != null) {
          j.tasks += e.stageInfo.numTasks
          j.taskMs += e.stageInfo.taskMetrics.executorRunTime
        }
      }
    })

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    for (r <- 1 to reps) {
      jobs.clear(); order.clear(); stageToJob.clear()
      val scratch = java.nio.file.Files.createTempDirectory("graft-q81-jobs")
      try {
        val gc0 = gcMs()
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.streamingMinHashNearDuplicates(spark, sfDir,
          "documents.parquet", "doc_id", "text",
          stateDir = s"$scratch/state", checkpointDir = s"$scratch/ckpt",
          threshold = 0.5).orderBy("id_a", "id_b").count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"== run$r wall=$wall%5.2f s gc=${gcMs() - gc0}%4d ms pairs=$n")
        // snapshot under the list's lock (the listener bus may still append)
        val snapshot = order.synchronized {
          import scala.jdk.CollectionConverters._
          order.asScala.toVector
        }
        snapshot.foreach { j =>
          val d = if (j.t1 < 0) -1.0 else (j.t1 - j.t0) / 1e3
          println(f"   job${j.id}%3d ${d}%6.2f s tasks=${j.tasks}%4d " +
            f"taskTime=${j.taskMs / 1000.0}%7.2f s  ${j.stage}")
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
    }
    spark.stop()
  }
}
