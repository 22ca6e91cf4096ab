package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-17 (VERDICT r16 #4): decompose the streaming micro-batch setup
  * floor (~0.26–0.31 s, paid once per `_streaming` query ≈ 13× per suite
  * pass). Times each variant `n` times (median + min reported):
  *
  *   full        — the exact Bench.streamFloor path: parquet file source
  *                 (region table) → memory sink, start/drain/stop.
  *   memsrc      — MemoryStream source → memory sink: removes the file
  *                 source's schema probe, directory listing and file-source
  *                 log, keeping query start/plan/offset-log/sink/stop.
  *   shmckpt     — full path but checkpointLocation on /dev/shm: isolates
  *                 checkpoint/offset-log disk I/O.
  *   secondbatch — one started query fed twice (two addData+drain rounds):
  *                 the marginal per-batch cost with start/stop amortized.
  *   noop        — start/stop on an ALREADY-DRAINED memory stream (no new
  *                 data): query lifecycle alone.
  *
  * Usage: tools/runjava graft.examples.StreamFloorProbe [sfDir] [n]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(7)
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
    import spark.implicits._
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, runs: Seq[Double]): Unit = {
      val s = runs.sorted
      println(f"$name%-12s med=${s(s.size / 2)}%.3f min=${s.head}%.3f " +
        s"all=[${s.map(v => f"$v%.3f").mkString(",")}]")
    }
    def drainFile(ckpt: Option[String]): Unit = {
      val schema = spark.read.parquet(s"$sfDir/region.parquet").schema
      val name = "floorprobe_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val w = spark.readStream.schema(schema)
        .option("pathGlobFilter", "region.parquet").parquet(sfDir)
        .writeStream.outputMode("append").format("memory").queryName(name)
      val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name).count()
      spark.catalog.dropTempView(name)
    }

    // warmup both paths once (classloading/codegen)
    drainFile(None)
    report("full", (1 to n).map(_ => time(drainFile(None))))

    report("shmckpt", (1 to n).map { _ =>
      val c = s"/dev/shm/floorprobe_${java.util.UUID.randomUUID()}"
      val t = time(drainFile(Some(c)))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(c))
      catch { case _: Throwable => () }
      t
    })

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def drainMem(rounds: Int): Unit = {
      val ms = MemoryStream[Int]
      val name = "floorprobe_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = ms.toDF().writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        var r = 0
        while (r < rounds) {
          if (rounds > 0) ms.addData(1 to 5: _*)
          q.processAllAvailable()
          r += 1
        }
      } finally q.stop()
      spark.table(name).count()
      spark.catalog.dropTempView(name)
    }
    drainMem(1)
    report("memsrc", (1 to n).map(_ => time(drainMem(1))))
    report("noop", (1 to n).map(_ => time(drainMem(0))))
    // marginal batch: difference between 2-round and 1-round drains
    val one = (1 to n).map(_ => time(drainMem(1)))
    val two = (1 to n).map(_ => time(drainMem(2)))
    report("1batch", one)
    report("2batch", two)
    println(f"marginal per-batch ≈ ${two.sorted.apply(n / 2) - one.sorted.apply(n / 2)}%.3f")
    spark.stop()
  }
}
