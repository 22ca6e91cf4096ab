package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing primitives for training-corpus
  * assembly: per-stratum down-sampling and integer up-weighting.
  *
  * Both are pure per-row expressions — no `count()`, no shuffle, no RNG
  * state — so they run inside the scan stage at any scale and an external
  * oracle reproduces the exact row selection from the same md5 arithmetic
  * ([[Similarity.hashSample]]).
  */
object Sampling {

  /** Keep ~`fraction(stratum)` of each stratum's rows, deterministically by
    * `md5(id)` — the data-mixing primitive (e.g. per-language or per-source
    * rates when assembling a training corpus). Rows of strata absent from
    * `fractions` keep `defaultFraction`.
    *
    * The per-row predicate composes a `when` chain over
    * [[Similarity.hashSample]]; there is no sampling state, so the same row
    * set is selected on any cluster size, any partitioning, and any engine
    * with md5.
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Seq[(String, Double)],
      defaultFraction: Double = 1.0): DataFrame = {
    val pred = fractions.foldRight(
      Similarity.hashSample(col(idCol), defaultFraction): Column) {
      case ((stratum, fraction), rest) =>
        when(col(strataCol) === stratum,
          Similarity.hashSample(col(idCol), fraction)).otherwise(rest)
    }
    df.filter(pred)
  }

  /** Integer up-weighting: repeat each row `weight(stratum)` times (default
    * 1), adding a 1-based `copyCol` so downstream shuffles and dedup keys
    * can distinguish copies. `explode(sequence(...))` is codegen'd and
    * stays in the scan stage — the standard epoch-mixture trick (repeat
    * high-quality sources N×) without materializing the corpus N times.
    */
  def weightedRepeat(
      df: DataFrame,
      strataCol: String,
      weights: Seq[(String, Int)],
      copyCol: String = "copy"): DataFrame = {
    require(weights.forall(_._2 >= 1), "weights must be >= 1")
    val w = weights.foldRight(lit(1): Column) { case ((stratum, n), rest) =>
      when(col(strataCol) === stratum, lit(n)).otherwise(rest)
    }
    df.withColumn(copyCol, explode(sequence(lit(1), w)))
  }
}
