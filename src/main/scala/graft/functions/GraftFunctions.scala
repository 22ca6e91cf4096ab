package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  * (No custom Rule/SparkStrategy is required anywhere — see SURVEY §4 — so
  * function registration is the only session wiring the engine needs.)
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot",
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("minhash_sig",
      (exprs: Seq[Expression]) =>
        HashExpressions.MinHashSig(exprs(0), intArg(exprs(1), "minhash_sig")), "scala_udf")
    registry.createOrReplaceTempFunction("simhash64",
      (exprs: Seq[Expression]) => HashExpressions.SimHash64(exprs(0)), "scala_udf")
    registry.createOrReplaceTempFunction("shingle_set",
      (exprs: Seq[Expression]) =>
        HashExpressions.ShingleSet(exprs(0), intArg(exprs(1), "shingle_set")), "scala_udf")
    registry.createOrReplaceTempFunction("ngram_set",
      (exprs: Seq[Expression]) =>
        HashExpressions.NgramSet(exprs(0), intArg(exprs(1), "ngram_set")), "scala_udf")
    registry.createOrReplaceTempFunction("unicode_normalize",
      (exprs: Seq[Expression]) =>
        UnicodeExpressions.UnicodeNormalize(exprs(0), strArg(exprs(1), "unicode_normalize")),
      "scala_udf")
    registry.createOrReplaceTempFunction("url_canonicalize",
      (exprs: Seq[Expression]) => UrlExpressions.UrlCanonicalize(exprs(0)),
      "scala_udf")
    registry.createOrReplaceTempFunction("url_host",
      (exprs: Seq[Expression]) => UrlExpressions.UrlHost(exprs(0)),
      "scala_udf")
  }

  private def strArg(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
      v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal argument, got $other")
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got $other")
  }
}
