package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The iterative-operator checkpoint discipline: reliable checkpoints when
  * the session has a checkpoint dir (the cluster posture — every other
  * suite exercises the localCheckpoint path), storage released as
  * iterations supersede each other, results identical either way.
  */
class CheckpointsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var ckptDir: java.nio.file.Path = _

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("CheckpointsSpec")
      .getOrCreate()
    ckptDir = graft.TestScratch.path("graft-ckpt")
    s.sparkContext.setCheckpointDir(ckptDir.toString)
    s
  }

  override def afterAll(): Unit = {
    spark.stop()
    if (ckptDir != null) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def chainPairs = {
    import spark.implicits._
    // 1-2-3-4 chain plus isolated 10-11 pair: two components.
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
  }

  test("truncate uses a reliable checkpoint when a checkpoint dir is set") {
    val out = Checkpoints.truncate(spark.range(100).toDF())
    assert(out.count() === 100)
    // Reliable checkpoints write rdd-* data under the configured dir.
    import scala.jdk.CollectionConverters._
    val wrote = java.nio.file.Files.walk(ckptDir).iterator().asScala
      .exists(_.getFileName.toString.startsWith("rdd-"))
    assert(wrote, s"expected rdd-* checkpoint data under $ckptDir")
  }

  test("duplicateClusters is correct under a reliable checkpoint dir") {
    val clusters = Dedup.duplicateClusters(chainPairs, localEdgeLimit = 0L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("superseded iterations leave no block-manager storage behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Dedup.duplicateClusters(chainPairs, localEdgeLimit = 0L).count()
    // The chain closure needs multiple iterations (diameter 3); at most
    // the LAST labels checkpoint may remain registered — edges and every
    // superseded iteration must have been unpersisted.
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"expected <=1 live checkpoint RDD, got $leaked")
  }

  test("ivfKMeans releases every superseded Lloyd frame (storage and files)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val sc = spark.sparkContext
    def newRddDirs(before: Set[java.nio.file.Path]) =
      java.nio.file.Files.walk(ckptDir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toSet -- before
    def dirBytes(dirs: Set[java.nio.file.Path]): Long = dirs.iterator.map { d =>
      java.nio.file.Files.walk(d).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }.sum
    // Big enough that a leaked corpus-sized assignment checkpoint (~100 B
    // serialized per row x 2000 rows) is unmistakably larger than the
    // nlist-sized centroid leaf the operator intentionally keeps.
    val vecs = (0 until 2000).map { i =>
      (i.toLong, Seq.tabulate(16)(j => ((i % 4) * 10 + (i + j) % 3).toFloat))
    }.toDF("id", "vec")
    val beforeRdds = sc.getPersistentRDDs.keySet
    val before = newRddDirs(Set.empty)
    val (assigned, centroids) =
      Similarity.ivfKMeans(vecs, "id", "vec", nlist = 4, iterations = 3)
    assert(assigned.count() === 2000 && centroids.count() >= 1)
    // Three Lloyd rounds truncate three assignment frames and three
    // centroid tables; everything superseded must release its checkpoint
    // files. The only survivor may be the final centroid LEAF — nlist
    // rows, a few KB — where the pre-fix behavior pinned the final
    // ASSIGNMENT checkpoint (corpus-sized, unreleasable by the caller)
    // via the returned centroids' lineage. The returned assignment
    // itself is a plain persist, the one block-manager entry allowed.
    val after = newRddDirs(before)
    assert(after.size <= 1,
      s"checkpoint dirs leaked: ${after.size} new rdd-* dirs")
    assert(dirBytes(after) < 64 * 1024,
      s"a corpus-sized checkpoint survived: ${dirBytes(after)} bytes " +
        "of rdd-* files remain (expected only the nlist-sized centroid leaf)")
    val leaked = sc.getPersistentRDDs.keySet -- beforeRdds
    assert(leaked.size <= 1,
      s"expected only the persisted result, got RDDs $leaked")
    assigned.unpersist(blocking = true)
  }

  test("release is a no-op on non-checkpointed frames") {
    val df = spark.range(10).toDF()
    Checkpoints.release(df) // must not throw
    assert(df.count() === 10)
  }
}
