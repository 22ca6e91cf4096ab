package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Evidence probe for the IVF maintenance path (VERDICT r10 item 3): a
  * streaming-grown index whose ingest DRIFTED from the build-time
  * distribution loses probe recall under the pinned geometry;
  * [[Similarity.ivfDriftReport]] must surface that drift, and
  * [[Similarity.rebalanceIvfIndex]] must recover the recall.
  *
  * Shape: corpus A (8 hash-noise clusters) builds the index via
  * ivfKMeans + saveIvfIndex; corpus B — 2× A's size, its clusters
  * sitting on the MIDPOINTS of adjacent A clusters, i.e. on the pinned
  * geometry's Voronoi boundaries — streams in through the real
  * [[Similarity.streamingIvfIngest]] path under the pinned centroids.
  * Recall@10 for a panel of B-region queries is measured against the
  * exact brute-force top-k before and after the rebuild, with the drift
  * report summarized at both points. Deterministic throughout
  * (hash-derived vectors, md5 panel selection — no RNG).
  *
  * Representative run (nA=20k, nB=40k, dim 16, nlist 32, nprobe 1):
  * drift_ppm max 65877 / avg 18666 and member skew 5941:323 after the
  * drifted ingest, recall@10 0.810; after a 2-iteration rebalance
  * (~3 s) drift_ppm max 177 / avg 19, recall@10 0.975.
  *
  * Usage: sbt "runMain graft.examples.IvfRebalanceProbe [nA] [nB]"
  */
object IvfRebalanceProbe {
  def main(args: Array[String]): Unit = {
    val nA = args.headOption.map(_.toInt).getOrElse(20000)
    val nB = args.lift(1).map(_.toInt).getOrElse(40000)
    val dim = 16
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Hash-noise vectors around 8 cluster centers. Corpus A sits on the
    // centers themselves; corpus B (midpoint = true) sits on the
    // MIDPOINTS of adjacent centers — i.e. exactly on the pinned
    // geometry's Voronoi boundaries, so each drifted cluster's members
    // split between two build-time cells and an nprobe=1 probe finds
    // only the half filed on its own side. The adversarial drift shape:
    // crowding alone only raises probe cost; boundary-straddling is
    // what actually costs recall.
    def synth(idStart: Long, n: Int, midpoint: Boolean): DataFrame = {
      def ctr(c: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
        ((c * lit(31) + j * lit(17)) % 13).cast("double") / lit(13.0)
      val c = col("id") % 8
      spark.range(idStart, idStart + n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), j => {
          val center = if (midpoint) (ctr(c, j) + ctr((c + 1) % 8, j)) / 2.0
            else ctr(c, j)
          (center
            + (pmod(xxhash64(col("id") * lit(1000003L) + j), lit(1000))
                .cast("double") / lit(10000.0))).cast("float")
        }).as("embedding"))
    }

    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-ivf-rebalance").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val corpusA = synth(0L, nA, midpoint = false).persist()
    val corpusB = synth(nA.toLong, nB, midpoint = true)
    corpusB.write.mode("overwrite").parquet(s"$base/ingest/batch.parquet")

    // Build on A, persist the index, then stream B in under the PINNED
    // build-time centroids — the q82 contract.
    val (assignedA, centroids) =
      Similarity.ivfKMeans(corpusA, "vec_id", "embedding",
        nlist = 32, iterations = 2)
    Similarity.saveIvfIndex(
      assignedA.select("vec_id", "embedding", "centroid_id"),
      centroids, s"$base/index")
    val grown = Similarity.streamingIvfIngest(spark,
      s"$base/ingest/batch.parquet", "*.parquet",
      "vec_id", "embedding", centroids,
      indexDir = s"$base/index", checkpointDir = s"$base/ckpt").persist()
    println(s"index grown: ${assignedA.count()} built + " +
      s"${grown.count() - assignedA.count()} ingested")
    assignedA.unpersist()

    def driftSummary(label: String, assigned: DataFrame,
        cents: DataFrame): Unit = {
      val d = Similarity.ivfDriftReport(assigned, cents, "embedding")
        .agg(max(col("drift_ppm")), avg(col("drift_ppm")),
          max(col("n_members")), min(col("n_members"))).first()
      println(f"$label: drift_ppm max=${d.getLong(0)} " +
        f"avg=${d.getDouble(1)}%.0f members max=${d.getLong(2)} " +
        f"min=${d.getLong(3)}")
    }

    val full = corpusA.unionByName(corpusB).persist()
    val panel = corpusB
      .filter(substring(md5(col("vec_id").cast("string")), 1, 2) < "08")
      .limit(20)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    println(s"query panel: ${panel.length} B-region queries")

    def recallAt10(assigned: DataFrame, cents: DataFrame,
        nprobe: Int): Double = {
      val hits = panel.map { case (_, q) =>
        val exact = Similarity.topKForQuery(full, "vec_id", "embedding",
          q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = Similarity.ivfTopKForQuery(assigned, cents,
          "vec_id", "embedding", q, 10, nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact intersect approx).size / 10.0
      }
      hits.sum / hits.length
    }

    driftSummary("before", grown, centroids)
    val before = recallAt10(grown, centroids, nprobe = 1)
    println(f"recall@10 BEFORE rebalance (nprobe=1): $before%.3f")

    val t0 = System.nanoTime()
    Similarity.rebalanceIvfIndex(spark, s"$base/index",
      s"$base/index_rebuilt", iterations = 2)
    println(f"rebalance: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val (assigned2, centroids2) =
      Similarity.loadIvfIndex(spark, s"$base/index_rebuilt")
    driftSummary("after", assigned2, centroids2)
    val after = recallAt10(assigned2, centroids2, nprobe = 1)
    println(f"recall@10 AFTER rebalance (nprobe=1): $after%.3f")
    println(s"""{"probe":"ivf_rebalance","nA":$nA,"nB":$nB,""" +
      s""""recall_before":$before,"recall_after":$after}""")
    spark.stop()
  }
}
