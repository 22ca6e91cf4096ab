package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dot product of two numeric array
  * columns (float or double elements), with whole-stage codegen.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * runs on the interpreted higher-order-function path — fine for occasional
  * use, ~100× too slow when the dot product sits inside a join predicate
  * evaluated per candidate pair (ANN verification, IVF assignment). This is
  * the "custom Expression beats UDF beats interpreted" rung of the
  * preference ladder: a tight primitive loop inside codegen, no
  * per-element boxing or lambda dispatch.
  *
  * Summation is sequential (index order), matching both the interpreted
  * formulation and DuckDB's `list_sum`, so oracle results stay bit-identical.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"VecDot expects array<float>/array<double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getA * $getB;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-level dot product with codegen. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Argmax-cosine centroid id for a float-vector column against a
  * plan-embedded centroid table — the IVF assignment collapsed into ONE
  * codegen'd projection.
  *
  * The declarative formulation (cross join against the broadcast centroid
  * frame, then pick the best row per vector) multiplies the corpus by
  * nlist and must collapse it back: a `row_number` window externally SORTS
  * the n × nlist scored stream (vector payloads included), and the
  * aggregate alternatives fall off the fast path too — `max_by` keyed by a
  * `(sim, -cid)` struct has a non-mutable buffer, so HashAggregateExec
  * rejects it and the plan degrades to sort-based aggregation of the same
  * n × nlist stream. Since the centroid side is nlist-BOUNDED by
  * construction (the whole point of the IVF design), it fits in the plan
  * itself: this expression holds the (id-ascending) centroid array as a
  * codegen reference object and emits the best centroid id in a tight
  * primitive loop — no join, no aggregate, no sort, no extra rows; the
  * assignment stage becomes scan → project at any corpus size.
  *
  * Arithmetic is bit-identical to the declarative path (and to the DuckDB
  * oracle's `list_sum(list_transform(...))`): double-accumulated
  * sequential dot products over float elements, `sim = denom > 0 ?
  * dot/denom : 0`, ties broken toward the lowest centroid id by strict-`>`
  * updates over the ascending-id centroid order.
  */
case class NearestCentroid(
    child: Expression,
    centroidIds: Array[Long],
    // Doubles regardless of source: float centroids widen exactly, so the
    // arithmetic matches VecDot's (double)getFloat path bit-for-bit, and
    // Lloyd-refined double centroids ride through unchanged.
    centroidVecs: Array[Array[Double]]) extends UnaryExpression {

  require(centroidIds.nonEmpty && centroidIds.length == centroidVecs.length,
    "NearestCentroid needs a non-empty, aligned centroid table")

  override def dataType: DataType = LongType

  // Type-checked at resolution (the child is unresolved at construction).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NearestCentroid expects array<float>, got $other")
    }

  /** Norms via the exact VecDot arithmetic (double accumulation of float
    * products, then sqrt) so results match the declarative formulation.
    */
  private lazy val centroidNorms: Array[Double] = centroidVecs.map { cv =>
    var s = 0.0
    var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var vn = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    var best = centroidIds(0)
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroidVecs.length) {
      val cv = centroidVecs(c)
      val n = math.min(dim, cv.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vec.getFloat(j).toDouble * cv(j); j += 1 }
      val denom = vn * centroidNorms(c)
      val sim = if (denom > 0) dot / denom else 0.0
      if (sim > bestSim) { bestSim = sim; best = centroidIds(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cids = ctx.addReferenceObj("cids", centroidIds, "long[]")
      val cvecs = ctx.addReferenceObj("cvecs", centroidVecs, "double[][]")
      val cnorms = ctx.addReferenceObj("cnorms", centroidNorms, "double[]")
      val dim = ctx.freshName("dim")
      val vn = ctx.freshName("vn")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      s"""
         |int $dim = $v.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $x = (double) $v.getFloat($i);
         |  $vn += $x * $x;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |long $best = $cids[0];
         |double $bestSim = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cvecs.length; $c++) {
         |  double[] $cv = $cvecs[$c];
         |  int $n = java.lang.Math.min($dim, $cv.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $v.getFloat($j)) * $cv[$j];
         |  }
         |  double $denom = $vn * $cnorms[$c];
         |  double $sim = ($denom > 0.0) ? ($dot / $denom) : 0.0;
         |  if ($sim > $bestSim) { $bestSim = $sim; $best = $cids[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-level nearest-centroid assignment; the centroid table is
    * sorted by id here so tie-breaks are order-independent of the input.
    */
  def assign(vec: Column, centroids: Seq[(Long, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1).toArray
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec),
      sorted.map(_._1), sorted.map(_._2)))
  }
}
