package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

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
    // Column-composition functions (TextFunctions builds them from
    // built-in expressions): the bridge wraps the argument expression in
    // a Column, composes, and converts back through the SESSION's
    // ColumnNode converter — the SQL surface gets the exact tree the
    // Column API builds, still fully codegen'd.
    registry.createOrReplaceTempFunction("tokens",
      (exprs: Seq[Expression]) => ColumnBridge.expression(
        TextFunctions.tokens(ColumnBridge.column(exprs(0))), spark),
      "scala_udf")
    registry.createOrReplaceTempFunction("quality_score",
      (exprs: Seq[Expression]) => ColumnBridge.expression(
        TextFunctions.qualityScore(ColumnBridge.column(exprs(0))), spark),
      "scala_udf")
    registry.createOrReplaceTempFunction("char_bigram_entropy",
      (exprs: Seq[Expression]) =>
        HashExpressions.CharBigramEntropy(exprs(0)), "scala_udf")
    // nearest_centroid(vec, array(ids...), array(array(components...)...)):
    // the centroid table must be FOLDABLE (literal arrays or expressions
    // of literals) — it becomes the same bounded codegen reference object
    // the Column API's NearestCentroid.assign embeds, so SQL probes keep
    // the scan→project shape with no join. Ids and components accept any
    // numeric literal type (cast to long/double at registration).
    registry.createOrReplaceTempFunction("nearest_centroid",
      (exprs: Seq[Expression]) => {
        val ids = foldableArray(exprs(1), LongType, "nearest_centroid")
          .map(_.asInstanceOf[Long])
        val vecs = foldableNested(exprs(2), "nearest_centroid")
        require(ids.length == vecs.length,
          "nearest_centroid: ids and centroid vectors must align")
        val sorted = ids.zip(vecs).sortBy(_._1)
        NearestCentroid(exprs(0), sorted.map(_._1), sorted.map(_._2))
      }, "scala_udf")
  }

  private def foldableArray(e: Expression, elem: org.apache.spark.sql.types.DataType,
      fn: String): Array[AnyRef] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.ArrayType
    require(e.foldable, s"$fn expects a literal array argument, got $e")
    val cast = Cast(e, ArrayType(elem))
    cast.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val arr = a.toObjectArray(elem)
        // a NULL element would unbox to 0 downstream (null.asInstanceOf
        // on a primitive), silently corrupting ids — and non-numeric
        // literals cast to NULL, so this also rejects array('a','b')
        require(!arr.contains(null),
          s"$fn: array literal contains NULL (or non-$elem) elements")
        arr
      case other => throw new IllegalArgumentException(
        s"$fn expects an array literal, got $other")
    }
  }

  private def foldableNested(e: Expression, fn: String): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(e.foldable, s"$fn expects a literal array-of-arrays, got $e")
    val cast = Cast(e, ArrayType(ArrayType(DoubleType)))
    cast.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          require(!a.isNullAt(i), s"$fn: centroid vector $i is NULL")
          val inner = a.getArray(i)
          // toDoubleArray reads a NULL component as 0.0 from the raw
          // buffer (and a non-numeric literal casts to NULL) — reject
          // instead of silently shifting the centroid toward the origin
          require((0 until inner.numElements()).forall(j => !inner.isNullAt(j)),
            s"$fn: centroid vector $i contains NULL (or non-numeric) components")
          inner.toDoubleArray()
        }.toArray
      case other => throw new IllegalArgumentException(
        s"$fn expects an array-of-arrays literal, got $other")
    }
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
