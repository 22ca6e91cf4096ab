package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecDot

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (one pass, no shuffle for
  * a single query; one self-join for all-pairs). The scale paths are
  * IVF (inverted-file: cluster by nearest centroid, probe a few cells) and
  * random-hyperplane LSH bucketing — both bound the candidate set so the
  * 100 TB case never pays the O(n²) cross join.
  *
  * Vector arithmetic uses the codegen'd [[graft.functions.VecDot]]
  * expression; per-vector norms are projected once behind an exchange
  * barrier so pair-level evaluation does only one dot product (Catalyst's
  * CollapseProject would otherwise inline the whole norm computation into
  * every join predicate evaluation).
  */
object Similarity {

  /** Dot product (codegen). */
  def dot(a: Column, b: Column): Column = VecDot.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(VecDot.dot(a, a))

  /** Cosine similarity (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  private def parallelism(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Project (id, vec, norm) behind a repartition barrier: spreads the work
    * of a single-file scan and stops downstream plans from re-inlining the
    * norm computation.
    */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__norm"))
      .repartition(parallelism(df), col(idCol))

  /** Exact top-k neighbours of one query vector: a single scan, a partial
    * top-k per partition, and a k-row final sort — no shuffle of the data.
    */
  def topKForQuery(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qn = math.sqrt(query.map(v => v.toDouble * v.toDouble).sum)
    embeddings
      .select(col(idCol),
        when(lit(qn) * norm(col(vecCol)) > 0,
          dot(col(vecCol), q) / (lit(qn) * norm(col(vecCol))))
          .otherwise(lit(0.0)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact all-pairs top-k: self-join then windowed rank. Quadratic —
    * correctness baseline and the in-bucket verifier for the ANN paths.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val base = withNorm(embeddings, idCol, vecCol)
    val a = base.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__norm").as("na"))
    val b = base.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__norm").as("nb"))
    val sims = a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("na") * col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)).as("cosine_sim"))
    val w = Window.partitionBy("id_a").orderBy(col("cosine_sim").desc, col("id_b").asc)
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (seeded) for LSH bucketing. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector against `bits` seeded hyperplanes. */
  def lshBucket(vecCol: Column, dim: Int, bits: Int = 8, seed: Long = 42L): Column =
    hyperplanes(dim, bits, seed).zipWithIndex.map { case (h, i) =>
      val hc = array(h.map(lit): _*)
      when(dot(vecCol, hc) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate near-neighbour pairs: vectors sharing a
    * sign-bit bucket are verified with exact cosine ≥ threshold. One shuffle
    * on the bucket id; bucket population ~n/2^bits keeps the in-bucket
    * quadratic term bounded; the bucketed projection sits behind an exchange
    * so both self-join branches reuse one computation (ReuseExchange).
    */
  def lshNearNeighbors(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.8,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val bucketed = embeddings
      .select(col(idCol), col(vecCol),
        lshBucket(col(vecCol), dim, bits, seed).as("bucket"),
        norm(col(vecCol)).as("__norm"))
      .repartition(parallelism(embeddings), col("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("__norm").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("__norm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("na") * col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
      .distinct()
  }

  /** IVF index: centroids are a deterministic sample (every `n/nlist`-th
    * vector by id); each vector is assigned to its nearest centroid.
    * Returns the assignment frame (id, vec, centroid_id).
    */
  def ivfAssign(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): DataFrame = {
    val w = Window.orderBy(col(idCol))
    val numbered = embeddings.withColumn("__rn", row_number().over(w) - 1)
    val total = numbered.count()
    val step = math.max(1L, total / nlist)
    val centroids = numbered.filter(col("__rn") % step === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"),
        norm(col(vecCol)).as("__cnorm"))
    val base = withNorm(numbered.drop("__rn"), idCol, vecCol)
    val assigned = base
      .crossJoin(broadcast(centroids))
      .withColumn("sim",
        when(col("__norm") * col("__cnorm") > 0,
          dot(col(vecCol), col("centroid_vec")) / (col("__norm") * col("__cnorm")))
          .otherwise(lit(0.0)))
    val best = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("centroid_id").asc)
    assigned.withColumn("__r", row_number().over(best)).filter(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF approximate top-k for one query: probe the `nprobe` nearest
    * centroids' cells only. Candidate set is the probed cells, not the
    * corpus — the standard recall/cost dial.
    */
  def ivfTopKForQuery(
      assigned: DataFrame,
      centroids: DataFrame, // (centroid_id, centroid_vec)
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qn = math.sqrt(query.map(v => v.toDouble * v.toDouble).sum)
    def cosTo(c: Column): Column = {
      val denom = lit(qn) * sqrt(dot(c, c))
      when(denom > 0, dot(c, q) / denom).otherwise(lit(0.0))
    }
    val probed = centroids
      .select(col("centroid_id"), cosTo(col("centroid_vec")).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select("centroid_id")
    assigned.join(broadcast(probed), "centroid_id")
      .select(col(idCol), cosTo(col(vecCol)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
