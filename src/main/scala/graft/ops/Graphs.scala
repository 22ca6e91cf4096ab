package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over an edge list — the host-authority step a
  * crawl-curation pipeline runs to prioritize seeds and weight domains
  * (Common-Crawl-style host ranking), next to the connected-component
  * machinery in [[Dedup.duplicateClusters]].
  *
  * The rank arithmetic is INTEGER micro-units end to end (the same
  * exactness discipline as the unigram trainer's micro-nat costs): each
  * node starts with `RU/N` rank units (RU = 1e12), an edge carries
  * `floor(rank/outdeg)`, and the damped update is
  * `base + floor(d·Σcontribs/1e6)` with everything in Long — so the
  * result is a pure function of the edge list, independent of
  * partitioning, float-fold order, or engine, and the DuckDB oracle
  * replays iterations as plain unrolled CTEs. (Floor division sheds a
  * few units of mass per hop — the ranking signal is unaffected and
  * exactness is what makes the result portable; dangling-node mass is
  * dropped as in the standard simplified formulation.)
  *
  * Scale shape: per iteration, ONE equi-join of the rank table with the
  * edge list on the source key and ONE hash aggregate on the
  * destination key (partials combine map-side) — the canonical
  * distributed PageRank plan. Rank/degree tables are node-sized; the
  * edge list is the big side and is never reshaped. Each iteration's
  * rank frame is lineage-truncated ([[Checkpoints.truncate]]) and the
  * superseded one released, so plan size and storage stay flat in the
  * iteration count (the q51 lesson).
  */
object Graphs {

  /** Total rank mass in micro-units: 1e12 spreads comfortably over
    * billion-node graphs (≥ 1000 units/node) while `dampingPpm · Σ`
    * stays far below Long overflow. */
  val RankUnits: Long = 1000000000000L

  /** Multi-edges count once per occurrence (weighted-edge semantics);
    * self-loops are dropped. Returns (node, rank_u) — rank in integer
    * micro-units of RU. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0, 1e6], got $dampingPpm")
    val e = Checkpoints.truncate(edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src") =!= col("dst")))
    val nodes = Checkpoints.truncate(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct())
    val outdeg = Checkpoints.truncate(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")))
    val n = nodes.count()
    val init = RankUnits / math.max(n, 1L)
    val base = ((1000000L - dampingPpm) * init) / 1000000L
    var ranks = Checkpoints.truncate(
      nodes.select(col("node"), lit(init).as("rank_u")))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(outdeg, Seq("node"))
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          expr("rank_u div outdeg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      val prev = ranks
      ranks = Checkpoints.truncate(
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr(
              s"($dampingPpm * coalesce(__sum, 0L)) div 1000000"))
              .as("rank_u")))
      Checkpoints.release(prev)
    }
    // The final ranks frame is itself a checkpoint leaf, so every input
    // (edges, degrees, node list) can be released now.
    Checkpoints.release(e)
    Checkpoints.release(outdeg)
    Checkpoints.release(nodes)
    ranks
  }
}
