package graft.examples

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Counting local filesystem for the idle-cost probe: every metadata
  * operation whose path sits under the registered prefix bumps a
  * per-operation counter. Registered via `fs.file.impl` in the probe's
  * Hadoop conf — probe-only; production code never loads it. exists()
  * is not overridden because FileSystem implements it via
  * getFileStatus, which is.
  */
class CountingLocalFs extends org.apache.hadoop.fs.LocalFileSystem {
  import CountingLocalFs._
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    bump("getFileStatus", f); super.getFileStatus(f)
  }
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    bump("listStatus", f); super.listStatus(f)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    bump("rename", src); super.rename(src, dst)
  }
  override def delete(f: Path, recursive: Boolean): Boolean = {
    bump("delete", f); super.delete(f, recursive)
  }
  override def mkdirs(f: Path): Boolean = {
    bump("mkdirs", f); super.mkdirs(f)
  }
}

object CountingLocalFs {
  val counts = new ConcurrentHashMap[String, AtomicLong]()
  val bySubdir = new ConcurrentHashMap[String, AtomicLong]()
  @volatile var prefix: String = ""
  private[examples] def bump(op: String, p: Path): Unit = {
    val pre = prefix
    val s = p.toString
    val i = if (pre.isEmpty) -1 else s.indexOf(pre)
    if (i >= 0) {
      counts.computeIfAbsent(op, _ => new AtomicLong).incrementAndGet()
      // first path component below the prefix (the state subdir /
      // marker dir / staging sibling) — the per-family attribution that
      // turns a total into a consolidation target
      val rest = s.substring(i + pre.length).stripPrefix("/")
      val sub = rest.split("/", 2).head
      bySubdir.computeIfAbsent(if (sub.isEmpty) "<root>" else sub,
        _ => new AtomicLong).incrementAndGet()
    }
  }
  def reset(newPrefix: String): Unit = {
    prefix = newPrefix; counts.clear(); bySubdir.clear()
  }
  private def snap(m: ConcurrentHashMap[String, AtomicLong]): Map[String, Long] = {
    val it = m.entrySet().iterator()
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.get }
    b.result()
  }
  def snapshot(): Map[String, Long] = snap(counts)
  def snapshotSubdirs(): Map[String, Long] = snap(bySubdir)
}

/** Steady-state idle cost of the WHOLE streaming keyed-sink envelope
  * (VERDICT r14 stretch #8): each sink family runs one bulk batch plus N
  * trickle batches, and the probe reports per-trickle-batch wall time
  * AND per-operation driver fs-op counts scoped to that family's state
  * dirs — so a protocol regression (an extra exists, a re-listing, a
  * second staging pass) shows up as a counter diff instead of a bench
  * archaeology exercise. The crash-safety contract is O(touched
  * partitions) fs ops per batch, data-volume independent; these counters
  * are that contract, measured.
  *
  * Families: exact-dedup UPDATE sink (q46 shape, replace-by-key),
  * sequence-assembly merge sink (q88, accumulate-merge), MinHash
  * near-dedup state (q81, fenced appends + compaction), IVF ingest (q82,
  * partitioned appends).
  *
  * Usage: sbt "runMain graft.examples.StreamingEnvelopeIdleProbe [nTrickle]"
  */
object StreamingEnvelopeIdleProbe {
  def main(args: Array[String]): Unit = {
    val nTrickle = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.file.impl", classOf[CountingLocalFs].getName)
    spark.sparkContext.hadoopConfiguration
      .setBoolean("fs.file.impl.disable.cache", false)

    def writeTrickle(dir: String, mk: Int => org.apache.spark.sql.DataFrame): Unit = {
      mk(-1).coalesce(2).write.mode("append").parquet(dir) // bulk
      Thread.sleep(40)
      for (b <- 0 until nTrickle) {
        mk(b).coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(40)
      }
    }

    /** Run `body` (a full drain over bulk + trickle batches), report wall
      * and the per-op fs counters under `statePrefix`, normalized per
      * trickle batch. The prefix points at the SINK/STATE dir (not the
      * checkpoint dir): Spark's own HDFSMetadataLog traffic would
      * otherwise dominate the counters and mask protocol regressions. */
    def family(label: String, statePrefix: String)(body: => Long): Unit = {
      CountingLocalFs.reset(statePrefix)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      val ops = CountingLocalFs.snapshot().toSeq.sortBy(_._1)
      val subs = CountingLocalFs.snapshotSubdirs().toSeq.sortBy(-_._2)
      val total = ops.map(_._2).sum
      println(f"$label%-10s wall=$wall%6.2f s  rows=$rows  " +
        f"fsOps=$total (${total.toDouble / (nTrickle + 1)}%.0f/batch): " +
        ops.map { case (k, v) => s"$k=$v" }.mkString(" "))
      println("           by-subdir: " +
        subs.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }

    val base = java.nio.file.Files.createTempDirectory("graft-envelope").toString
    import spark.implicits._

    // q46 shape: exact-dedup UPDATE keyed sink
    val docsDir = s"$base/docs"
    writeTrickle(docsDir, b => (1L to 200L)
      .map(i => (b * 1000L + i, s"text body $b $i word" + (i % 7)))
      .toDF("doc_id", "text"))
    family("q46-exact", s"$base/q46/sink") {
      graft.ops.Dedup.streamingExactGroupsUpdate(spark, docsDir, "*.parquet",
        "doc_id", "text", sinkDir = s"$base/q46/sink",
        checkpointDir = s"$base/q46/ckpt", nBuckets = 8,
        maxFilesPerTrigger = 1).count()
    }

    // q88 shape: accumulate-merge keyed sink
    val evDir = s"$base/events"
    writeTrickle(evDir, b => (1L to 200L)
      .map(i => (i % 25, b * 1000L + i, i % 13, "e" + (i % 4)))
      .toDF("user_id", "ord", "tie", "ev"))
    family("q88-merge", s"$base/q88/sink") {
      val schema = spark.read.parquet(evDir).schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1).parquet(evDir)
      graft.ops.Curation.streamingAssembleSequences(stream,
        "user_id", "ord", "tie", "ev", sep = ">",
        sinkDir = s"$base/q88/sink", checkpointDir = s"$base/q88/ckpt",
        nBuckets = 8).count()
    }

    // q81 shape: MinHash near-dedup state (fenced appends + compaction).
    // nStateBuckets = 8 matches the other three families' bucket counts —
    // the r15 run left it at the default 32, so q81's envelope counted 3
    // stores × 4× the partition dirs of every sibling and read 5–9×
    // rather than ~3× (stores are the honest multiplier; buckets were a
    // probe-config artifact).
    family("q81-mh", s"$base/q81/state") {
      graft.ops.Dedup.streamingMinHashNearDuplicates(spark, docsDir,
        "*.parquet", "doc_id", "text", stateDir = s"$base/q81/state",
        checkpointDir = s"$base/q81/ckpt", threshold = 0.4,
        maxFilesPerTrigger = 1, nStateBuckets = 8).count()
    }

    // q82 shape: IVF streaming ingest (partitioned fenced appends)
    val embDir = s"$base/emb"
    writeTrickle(embDir, b => (1L to 100L)
      .map(i => (b * 1000L + i,
        Array.tabulate(8)(d => ((i * 31 + d * 7 + b) % 97).toFloat / 97f)))
      .toDF("vec_id", "embedding"))
    family("q82-ivf", s"$base/q82/index") {
      val emb = spark.read.parquet(embDir)
      val thr = graft.ops.Similarity.sampleThreshold(8L, emb.count())
      val centroids = emb
        .filter(graft.ops.Similarity.hashSampleByThreshold(col("vec_id"), thr))
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      graft.ops.Similarity.streamingIvfIngest(spark, embDir, "*.parquet",
        "vec_id", "embedding", centroids, indexDir = s"$base/q82/index",
        checkpointDir = s"$base/q82/ckpt", maxFilesPerTrigger = 1)
        .count()
    }

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
