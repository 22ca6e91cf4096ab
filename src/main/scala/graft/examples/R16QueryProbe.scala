package graft.examples

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-16 optimization probe: run named SparkEntry queries with a
  * listener that attributes wall time to Spark JOBS (count, per-job ms,
  * stages, tasks, shuffle read/write bytes) so a slow query classifies
  * itself — many tiny jobs (driver/action churn) vs one heavy stage
  * (data work) vs time outside any job (driver planning / fs protocol).
  *
  * Usage: runjava graft.examples.R16QueryProbe <sfDir> q31 q121 ...
  * Each query runs `repeats` times (default 3); the FIRST run carries
  * codegen/classload and is reported separately.
  */
object R16QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val repeats = sys.env.getOrElse("PROBE_REPEATS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    final case class Job(id: Int, t0: Long, stageIds: Set[Int],
        var t1: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var shufR: Long = 0L, var shufW: Long = 0L, var in: Long = 0L,
        var names: List[String] = Nil)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, Job(e.jobId, e.time,
          e.stageInfos.map(_.stageId).toSet))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        jobs.values().forEach { j =>
          if (j.stageIds.contains(info.stageId)) {
            j.stages += 1
            j.tasks += info.numTasks
            j.shufR += info.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufW += info.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.in += info.taskMetrics.inputMetrics.bytesRead
            j.names ::= s"${info.stageId}:${info.name.takeWhile(_ != ' ')}" +
              s"×${info.numTasks}"
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to repeats).foreach { r =>
        // mirror Bench.isolate(): memo-free pricing per repeat (r17)
        graft.SparkEntry.invalidateTransientState()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(50)
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        val js = {
          val b = scala.collection.mutable.ArrayBuffer.empty[Job]
          jobs.values().forEach(j => b += j)
          b.sortBy(_.t0).toSeq
        }
        val jobTime = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
        println(f"== $n run$r wall=$wall%.3f jobSum=$jobTime%.3f " +
          f"nJobs=${js.size} outside=${wall - jobTime}%.3f")
        if (r == repeats) {
          var prevEnd = 0L
          js.foreach { j =>
            val gap = if (prevEnd == 0) 0 else j.t0 - prevEnd
            prevEnd = math.max(prevEnd, j.t1)
            if (gap > 40) println(f"  -- gap ${gap}ms before job ${j.id}")
            println(f"  job=${j.id}%3d ms=${j.t1 - j.t0}%5d stages=${j.stages}%2d " +
              f"tasks=${j.tasks}%4d in=${j.in / 1024}%8dK shufR=${j.shufR / 1024}%7dK " +
              f"shufW=${j.shufW / 1024}%7dK ${j.names.reverse.mkString(",")}")
          }
        }
      }
    }
    spark.stop()
  }
}
