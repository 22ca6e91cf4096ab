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
    * micro-units of RU.
    *
    * `iters` is a CAP, not a prescription: with `tolUnits > 0` each
    * iteration also measures the L1 rank delta Σ|rank − prev| (in the
    * same integer micro-units, one scan of the just-checkpointed frame —
    * no extra pass over the edge list) and exits as soon as it falls to
    * `tolUnits` or below, so a converged graph stops paying edge-join
    * rounds. The default `tolUnits = 0` runs exactly `iters` rounds —
    * bit-identical to the historical fixed-iteration behavior, which is
    * what the unrolled-CTE oracles replay.
    *
    * `redistributeDangling = true` switches from the simplified
    * formulation (mass flowing into a node with no out-edges evaporates)
    * to the standard one: each iteration the dangling nodes' total rank
    * is measured IN-PLAN (a node-sized anti-join aggregated to one row,
    * broadcast back — no extra driver action) and every node receives
    * `floor(D/N)` of it alongside its edge contributions, so total mass
    * stays ~RU instead of draining. Defaults to false: the host-ranking
    * oracles (q147) pin the simplified formulation, and on a link graph
    * whose dangling share is small the two rankings agree — the
    * GraphsSpec dangling case quantifies the divergence on a
    * dangling-heavy graph.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingPpm: Long = 850000L,
      tolUnits: Long = 0L,
      redistributeDangling: Boolean = false): DataFrame =
    pageRankWithStats(edges, srcCol, dstCol, iters, dampingPpm, tolUnits,
      redistributeDangling)._1

  /** [[pageRank]] plus (iterations actually run, final L1 delta in
    * micro-units; −1 when `tolUnits = 0` since the delta is then never
    * measured) — exposed so specs and capacity planning can observe
    * convergence instead of trusting a fixed round count. */
  private[graft] def pageRankWithStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingPpm: Long = 850000L,
      tolUnits: Long = 0L,
      redistributeDangling: Boolean = false): (DataFrame, Int, Long) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0, 1e6], got $dampingPpm")
    require(tolUnits >= 0L, s"tolUnits must be >= 0, got $tolUnits")
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
    var leaf = Checkpoints.truncate(
      nodes.select(col("node"), lit(init).as("rank_u")))
    var ranks = leaf
    var itersRun = 0
    var lastDelta = -1L
    var done = false
    // Fixed-round loops (tolUnits = 0) truncate lineage every
    // `ckEvery` iterations instead of every iteration (guide §5: each
    // localCheckpoint is a full materialization job, and at 3–10 rounds
    // the per-iteration jobs dominated q147's wall — 29 jobs for 3
    // rounds). Plan depth between checkpoints stays bounded at ckEvery
    // × (2 joins + 1 aggregate); results are bit-identical (truncation
    // never changes data — the determinism sweeps pin this). The
    // convergence-checked path (tolUnits > 0) keeps per-iteration
    // truncation: its L1 delta is measured FROM the materialized frame.
    val ckEvery = 3
    var sinceCk = 0
    while (itersRun < iters && !done) {
      val contribs = ranks
        .join(outdeg, Seq("node"))
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          expr("rank_u div outdeg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      val updated =
        if (redistributeDangling) {
          // dangling mass this iteration, measured in-plan: one row,
          // broadcast back onto the node-sized update
          val dangling = ranks.join(outdeg, Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank_u")), lit(0L)).as("__dmass"))
          nodes.join(contribs, Seq("node"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit(base) + expr(
                s"($dampingPpm * (coalesce(__sum, 0L) + " +
                  s"__dmass div ${math.max(n, 1L)})) div 1000000"))
                .as("rank_u"))
        } else
          nodes.join(contribs, Seq("node"), "left")
            .select(col("node"),
              (lit(base) + expr(
                s"($dampingPpm * coalesce(__sum, 0L)) div 1000000"))
                .as("rank_u"))
      val prevLeaf = leaf
      if (tolUnits > 0L) {
        // carry the previous rank through the checkpoint so the L1 delta
        // is a single scan of the materialized partitions, like the
        // duplicateClusters convergence check
        leaf = Checkpoints.truncate(updated
          .join(ranks.select(col("node"), col("rank_u").as("__old")),
            Seq("node"))
          .select(col("node"), col("rank_u"), col("__old")))
        lastDelta = leaf
          .agg(coalesce(sum(abs(col("rank_u") - col("__old"))), lit(0L)))
          .first().getLong(0)
        ranks = leaf.select("node", "rank_u")
        done = lastDelta <= tolUnits
        Checkpoints.release(prevLeaf)
      } else {
        sinceCk += 1
        if (sinceCk >= ckEvery || itersRun == iters - 1) {
          // A lazy iteration's plan still references the previous leaf,
          // so the old leaf is only releasable once the NEW leaf is
          // materialized (the Checkpoints.release contract).
          leaf = Checkpoints.truncate(updated)
          ranks = leaf
          Checkpoints.release(prevLeaf)
          sinceCk = 0
        } else {
          ranks = updated
        }
      }
      itersRun += 1
    }
    // The final ranks frame is itself a checkpoint leaf, so every input
    // (edges, degrees, node list) can be released now.
    Checkpoints.release(e)
    Checkpoints.release(outdeg)
    Checkpoints.release(nodes)
    (ranks, itersRun, lastDelta)
  }
}
