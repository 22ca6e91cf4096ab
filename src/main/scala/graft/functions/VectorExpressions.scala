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

/** Product-quantization encoder: a float vector collapses to ONE packed
  * long of per-subspace codeword ids — the 8-byte PQ code that makes
  * billion-vector ANN memory-feasible (a dim-64 float vector is 256 bytes;
  * its m=8, ks=16 PQ code is 8 bytes in a plain long column).
  *
  * `codebooks(j)(c)` is subspace j's codeword c (sub-vectors of
  * deterministically sampled corpus vectors — the same md5-threshold
  * sample the IVF build uses, so an external oracle reproduces the
  * codebook row-for-row). Encoding is argmin squared-L2 per subspace with
  * ties to the LOWEST code id (strict-`<` updates over ascending code
  * order), packed mixed-radix: `packed = Σ_j code_j × ks^j`.
  *
  * Like [[NearestCentroid]], the codebook is ks×m-BOUNDED by construction,
  * so it rides inside the plan as a codegen reference object: encode is
  * scan → project at any corpus size — no join, no aggregate, no sort.
  * Arithmetic is double-accumulated sequential squared differences over
  * (double)-widened floats, matching a DuckDB oracle's
  * `list_sum(list_transform(...))` term-for-term.
  */
case class PqEncodePacked(
    child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private def m: Int = codebooks.length
  private def ks: Int = codebooks(0).length
  private def subDim: Int = codebooks(0)(0).length

  require(codebooks.nonEmpty && codebooks.forall(_.length == ks) &&
    codebooks.forall(_.forall(_.length == subDim)),
    "PqEncodePacked needs a rectangular m × ks × subDim codebook")
  require(m * (64 - java.lang.Long.numberOfLeadingZeros(ks.toLong)) <= 62,
    s"packed code ks^m must fit a long: ks=$ks m=$m")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PqEncodePacked expects array<float>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var packed = 0L
    var radix = 1L
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val off = j * subDim
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var s = 0.0
        var t = 0
        while (t < subDim && off + t < dim) {
          val d = vec.getFloat(off + t).toDouble - cw(t)
          s += d * d
          t += 1
        }
        if (s < bestDist) { bestDist = s; best = c }
        c += 1
      }
      packed += best * radix
      radix *= ks
      j += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbs = ctx.addReferenceObj("cbs", codebooks, "double[][][]")
      val dim = ctx.freshName("dim")
      val packed = ctx.freshName("packed")
      val radix = ctx.freshName("radix")
      val j = ctx.freshName("j")
      val book = ctx.freshName("book")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      s"""
         |int $dim = $v.numElements();
         |long $packed = 0L;
         |long $radix = 1L;
         |for (int $j = 0; $j < ${m}; $j++) {
         |  double[][] $book = $cbs[$j];
         |  int $off = $j * ${subDim};
         |  int $best = 0;
         |  double $bestDist = java.lang.Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $cw = $book[$c];
         |    double $s = 0.0;
         |    for (int $t = 0; $t < ${subDim} && $off + $t < $dim; $t++) {
         |      double $d = ((double) $v.getFloat($off + $t)) - $cw[$t];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestDist) { $bestDist = $s; $best = $c; }
         |  }
         |  $packed += $best * $radix;
         |  $radix *= ${ks}L;
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodePacked {
  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodePacked(ColumnBridge.expression(vec), codebooks))
}

/** Asymmetric-distance computation for PQ codes: unpack the mixed-radix
  * code and sum the query's per-subspace distance-table entries —
  * `adist = Σ_j dtab[j][code_j]`, the standard PQ/ADC approximation of the
  * query↔vector squared L2 distance. One table lookup per subspace, no
  * vector arithmetic in the corpus scan at all: the per-query table
  * (m × ks doubles, computed once per query against the bounded codebook)
  * arrives as the `dtab` array column of a broadcast query row.
  *
  * Summation is sequential over ascending subspace, matching a DuckDB
  * oracle's `list_sum` over a j-ordered transform term-for-term. ks is
  * read from the table's inner length, so the expression needs no static
  * codebook reference.
  */
case class PqAdcDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PqAdcDist expects (bigint, array<array<double>>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var rem = a.asInstanceOf[Long]
    val dtab = b.asInstanceOf[ArrayData]
    val m = dtab.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      val tab = dtab.getArray(j)
      val ks = tab.numElements()
      s += tab.getDouble((rem % ks).toInt)
      rem /= ks
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val rem = ctx.freshName("rem")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val tab = ctx.freshName("tab")
      val ks = ctx.freshName("ks")
      s"""
         |long $rem = $a;
         |int $m = $b.numElements();
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $tab = $b.getArray($j);
         |  int $ks = $tab.numElements();
         |  $s += $tab.getDouble((int) ($rem % $ks));
         |  $rem /= $ks;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcDist {
  def adist(packedCode: Column, dtab: Column): Column =
    ColumnBridge.column(PqAdcDist(ColumnBridge.expression(packedCode),
      ColumnBridge.expression(dtab)))
}
