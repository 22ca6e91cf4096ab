package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expressions for the dedup hot paths.
  *
  * The composable per-element formulations (`transform` + `array_min`,
  * `aggregate` over 64-wide bit arrays) run on the interpreted
  * higher-order-function path, paying expression-tree dispatch and boxing
  * per array element. These expressions evaluate once per ROW with a tight
  * JVM loop inside, and implement `doGenCode` as a static call into that
  * loop — so the enclosing Project/Filter stays INSIDE the whole-stage
  * codegen span (a CodegenFallback would evict the whole operator from the
  * span, de-fusing the surrounding pipeline, not just this expression).
  * Semantics match the composable versions exactly: MinHashSig's minima are
  * lexicographic minimums of lowercase md5-hex strings, identical to
  * `min(md5(j || ':' || shingle))` in any ANSI engine, so DuckDB oracles
  * are unaffected.
  */
object HashExpressions {

  /** MinHash signature: for j in 0 until numHashes, the lexicographically
    * smallest `md5Hex(j + ":" + shingle)` over the input shingle array.
    * Null/empty input → null.
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      minHashSigEval(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.HashExpressions.minHashSigEval($c, $numHashes);
        ${ev.isNull} = (${ev.value} == null);
      """)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[MinHashSig]]; called from generated code. */
  def minHashSigEval(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val minima = new Array[String](numHashes)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var j = 0
      while (j < numHashes) {
        md.reset()
        val hex = toHex(md.digest((j.toString + ":" + s).getBytes("UTF-8")))
        if (minima(j) == null || hex.compareTo(minima(j)) < 0) minima(j) = hex
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minima.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  private def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** 64-bit SimHash over a token array: bit b set when the sum over tokens
    * of ±1 (bit b of the token's 64-bit hash) is positive. The token hash is
    * derived from the first 16 hex chars of md5(token): bit b = bit (b mod 4)
    * of the hex digit at index b/4 — engine-portable (md5 of the same UTF-8
    * string is identical everywhere), so a DuckDB oracle can reproduce the
    * signature with `strpos('0123456789abcdef', substr(md5(t), b/4+1, 1))`
    * arithmetic. Duplicate tokens weight the fold by frequency.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      simHash64Eval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExpressions.simHash64Eval($c)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[SimHash64]]; called from generated code. */
  def simHash64Eval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).toString.getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val nibIdx = b >> 2 // hex char index 0..15 over digest bytes 0..7
        val byte = digest(nibIdx >> 1) & 0xff
        val nib = if ((nibIdx & 1) == 0) byte >>> 4 else byte & 0xf
        if (((nib >>> (b & 3)) & 1) == 1) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct word k-shingles of a text column in one row-level pass:
    * lowercase → whitespace split (Java `\s`, matching Spark's `split`) →
    * k-shingles joined by single spaces → first-occurrence distinct.
    * Equivalent to
    * `array_distinct(shinglesFromTokens(tokens(text), k))` but ~50× faster
    * (the composable form walks interpreted lambdas per element).
    * Output order only feeds order-insensitive consumers (min-hash minima,
    * set intersection sizes).
    */
  case class ShingleSet(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      shingleSetEval(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExpressions.shingleSetEval($c, $k)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[ShingleSet]]; called from generated code. */
  def shingleSetEval(input: UTF8String, k: Int): ArrayData = {
    val text = input.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(text.charAt(i))) i += 1
      if (i > start) toks += text.substring(start, i)
    }
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    val sb = new java.lang.StringBuilder(64)
    while (j <= toks.length - k) {
      sb.setLength(0)
      var m = 0
      while (m < k) {
        if (m > 0) sb.append(' ')
        sb.append(toks(j + m))
        m += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Distinct character n-grams of an already-normalized string in one
    * row-level pass; equivalent to
    * `array_distinct(ngramsFromNormalized(norm, n))`.
    */
  case class NgramSet(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ngramSetEval(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExpressions.ngramSetEval($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[NgramSet]]; called from generated code. */
  def ngramSetEval(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    if (text.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= text.length - n) {
      seen.add(text.substring(i, i + n))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct character n-grams as 64-BIT HASHES in one row-level pass —
    * the fixed-width form of [[NgramSet]] for the inverted-index pair
    * operators (round-17, guide §2.3 narrower types / §1.2 per-task
    * work). The string form allocates one substring + one UTF8String and
    * one hash-set probe per window; this form computes an FNV-1a/fmix64
    * hash over each window's chars with ZERO allocations and dedupes via
    * primitive sort+unique, and everything downstream (explode, persist,
    * df-cut aggregate, self-join) carries and compares 8-byte longs
    * instead of n-char strings. Gram identity is the 64-bit hash:
    * distinct counts and join matches equal the string form's unless two
    * distinct grams in the corpus collide (probability ≈ G²/2⁶⁵ over G
    * distinct grams — ~5e-8 at the 1.4M-gram sf0.1 index; the paired
    * spec proves the pair sets identical on the test corpora, and the
    * DuckDB oracle gates it at every SF). Output order is sorted-by-hash
    * (consumers are order-insensitive set operators).
    */
  case class NgramHashSet(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ngramHashSetEval(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExpressions.ngramHashSetEval($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[NgramHashSet]]; called from generated code. */
  def ngramHashSetEval(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    val w = text.length - n + 1
    if (w <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](w)
    var i = 0
    while (i < w) {
      // FNV-1a 64 over the window's UTF-16 code units + murmur3 fmix64
      // finalizer (avalanche for the short windows FNV alone mixes weakly)
      var h = 0xcbf29ce484222325L
      var j = i
      val end = i + n
      while (j < end) {
        h ^= text.charAt(j).toLong
        h *= 0x100000001b3L
        j += 1
      }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var k = 0
    while (k < w) {
      if (k == 0 || hs(k) != hs(k - 1)) { hs(m) = hs(k); m += 1 }
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(hs, m))
  }

  def ngramHashSet(norm: Column, n: Int): Column =
    ColumnBridge.column(NgramHashSet(ColumnBridge.expression(norm), n))

  /** Per-row char-bigram count + Shannon entropy as a struct — the whole
    * [[graft.ops.Curation.charEntropyReport]] inner computation in ONE
    * codegen'd row-level pass. The composable formulation exploded one row
    * PER CHARACTER and shuffled them twice ((doc, gram) agg + per-doc
    * fold) — a corpus-character-count shuffle; this keeps the
    * alphabet-bounded state inside the row, so the report is a pure
    * projection. Arithmetic replays the fold bit-for-bit: per-gram counts
    * folded in UTF-8 byte order, log2 = `StrictMath.log(x)/StrictMath
    * .log(2)` — exactly what Spark's `Log2` runs — so the DuckDB oracle
    * is unaffected. Input must already be lowercased by the caller (the
    * operator keeps `lower()` in the plan). Null for < 2 code points.
    */
  case class CharBigramEntropy(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("bigram_entropy", DoubleType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      charBigramEntropyEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.HashExpressions.charBigramEntropyEval($c);
        ${ev.isNull} = (${ev.value} == null);
      """)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static hot loop for [[CharBigramEntropy]]; called from generated
    * code. Bigrams are CODE-POINT pairs (matching `substr`'s character
    * semantics); gram order for the float fold is UTF8String binary
    * compare (what `sort_array` used).
    */
  def charBigramEntropyEval(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = input.toString
    val len = text.length
    if (len < 2) return null
    val counts = new java.util.HashMap[String, Array[Long]]()
    var nGrams = 0L
    var o0 = 0
    var o1 = text.offsetByCodePoints(0, 1)
    if (o1 >= len) return null // single code point (surrogate pair)
    while (o1 < len) {
      val o2 = text.offsetByCodePoints(o1, 1)
      val arr = counts.computeIfAbsent(text.substring(o0, o2),
        _ => Array(0L))
      arr(0) += 1
      nGrams += 1
      o0 = o1
      o1 = o2
    }
    val keys = counts.keySet().toArray(new Array[String](0))
    java.util.Arrays.sort(keys,
      (a: String, b: String) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    val log2 = java.lang.StrictMath.log(2.0)
    var acc = 0.0
    var i = 0
    while (i < keys.length) {
      val c = counts.get(keys(i))(0).toDouble
      acc += c * (java.lang.StrictMath.log(c) / log2)
      i += 1
    }
    val n = nGrams.toDouble
    val entropy = java.lang.StrictMath.log(n) / log2 - acc / n
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nGrams, entropy))
  }

  def charBigramEntropy(loweredText: Column): Column =
    ColumnBridge.column(CharBigramEntropy(ColumnBridge.expression(loweredText)))

  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def shingleSet(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), k))

  def ngramSet(norm: Column, n: Int): Column =
    ColumnBridge.column(NgramSet(ColumnBridge.expression(norm), n))

  /** Per-document repetition statistics in ONE row-level pass:
    * `(n_segments, n_distinct_segments, n_bigrams, top_bigram_count)` —
    * the [[graft.ops.Curation.repetitionReport]] signals. All four are
    * document-local, so this replaces the original explode → two-shuffle
    * formulation (≈50× the corpus row count through the exchange — the
    * composed-chain probe's q77.quality cliff) AND the interpreted
    * HOF rewrite (array_sort + aggregate lambdas evaluate per element;
    * measured 2× SLOWER than the shuffles at 2M docs). Segment split
    * matches Spark's `split(col, quote(sep), -1)` (trailing empties
    * kept, raw case); tokenization matches [[TextFunctions.tokens]]
    * (lowercase, `\s+`, empties dropped); bigram mode via one hash map.
    */
  case class RepetitionStats(child: Expression, separator: String)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_segments", LongType, nullable = false),
      StructField("n_distinct_segments", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("top_bigram_count", LongType, nullable = false)))
    // NULL text → all-zero counts, NOT null. Null-propagation forced every
    // consumer to wrap each field access in a `when(isNull(text), 0)`
    // guard, and codegen subexpression elimination skips CONDITIONALLY
    // evaluated subtrees — so the expression re-evaluated once per field
    // reference. Zero-counts-on-null makes every reference unconditional:
    // one evaluation per row, however many signals read it.
    override def nullable: Boolean = false

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      repetitionStatsEval(
        if (v == null) null else v.asInstanceOf[UTF8String], separator)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sepRef = ctx.addReferenceObj("sep", separator, "java.lang.String")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
            graft.functions.HashExpressions.repetitionStatsEval(
              ${c.isNull} ? null : ${c.value}, $sepRef);""",
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private val zeroRepetitionStats =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L, 0L, 0L))

  /** Static hot loop for [[RepetitionStats]]; called from generated code. */
  def repetitionStatsEval(input: UTF8String,
      sep: String): org.apache.spark.sql.catalyst.InternalRow = {
    if (input == null) return zeroRepetitionStats
    val text = input.toString
    // literal-separator split with Spark's limit=-1 semantics (trailing
    // empty segments kept; "" splits to one empty segment)
    var nSegs = 0L
    val segSet = new java.util.HashSet[String]()
    var from = 0
    val sl = sep.length
    var done = false
    while (!done) {
      val idx = if (sl == 0) -1 else text.indexOf(sep, from)
      val end = if (idx < 0) text.length else idx
      segSet.add(text.substring(from, end))
      nSegs += 1
      if (idx < 0) done = true else from = idx + sl
    }
    // tokens: lowercase, \s+ split, empties dropped (TextFunctions.tokens)
    val lowered = input.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = lowered.length
    while (i < n) {
      while (i < n && isWs(lowered.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lowered.charAt(i))) i += 1
      if (i > start) toks += lowered.substring(start, i)
    }
    val nBigrams = math.max(0, toks.length - 1).toLong
    var top = 0L
    if (nBigrams > 0) {
      val counts = new java.util.HashMap[String, Int]()
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < toks.length - 1) {
        sb.setLength(0)
        sb.append(toks(j)).append(' ').append(toks(j + 1))
        val key = sb.toString
        val c = counts.merge(key, 1, (a, b) => a + b)
        if (c > top) top = c.toLong
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nSegs, segSet.size().toLong, nBigrams, top))
  }

  def repetitionStats(text: Column, separator: String): Column =
    ColumnBridge.column(
      RepetitionStats(ColumnBridge.expression(text), separator))

  // ---- boilerplate-strip row passes ------------------------------------
  //
  // Both expressions split on the LITERAL separator at the UTF-8 byte
  // level: a valid UTF-8 byte sequence can only match at code-point
  // boundaries (UTF-8 self-synchronization), so byte-level indexOf equals
  // Spark's `split(col, Pattern.quote(sep), -1)` segmentation — trailing
  // empty segments kept, "" splits to one empty segment — without ever
  // decoding the document to a java String.

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def indexOfBytes(
      hay: Array[Byte], from: Int, needle: Array[Byte]): Int = {
    val n = needle.length
    if (n == 0) return -1
    val last = hay.length - n
    var i = from
    while (i <= last) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Per-document DISTINCT segment fingerprints (16-byte md5 of each
    * distinct segment's UTF-8 bytes) in one row pass — the map-side
    * dedup that lets [[graft.ops.Curation.stripBoilerplate]]'s
    * document-frequency shuffle carry one 16-byte fp per (doc, distinct
    * segment) with no corpus-scale (id, segment) exchange. Distinctness
    * is by segment VALUE (the md5 is computed once per distinct segment).
    */
  case class DistinctSegmentFps(child: Expression, separator: String)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def nullable: Boolean = true

    private lazy val sepBytes =
      separator.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override def nullSafeEval(input: Any): Any =
      distinctSegmentFpsEval(input.asInstanceOf[UTF8String], sepBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.distinctSegmentFpsEval($c, $sepRef)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Static hot loop for [[DistinctSegmentFps]]; called from generated code. */
  def distinctSegmentFpsEval(input: UTF8String, sep: Array[Byte]): ArrayData = {
    val bytes = input.getBytes
    val md = md5Local.get()
    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]](16)
    var from = 0
    var done = false
    while (!done) {
      val idx = indexOfBytes(bytes, from, sep)
      val end = if (idx < 0) bytes.length else idx
      val seg = UTF8String.fromBytes(bytes, from, end - from)
      if (seen.add(seg)) {
        md.update(bytes, from, end - from)
        out += md.digest()
      }
      if (idx < 0) done = true else from = idx + sep.length
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Row-local boilerplate excision: drop every segment whose md5 is in
    * the SORTED (hi, lo) fingerprint-pair array `fps` (flattened, length
    * 2n), rejoin survivors with the separator in original order. The
    * pair array ships with the serialized plan (task binaries are
    * torrent-broadcast once per executor), so the strip is a pure
    * projection — no join, no shuffle, no corpus-scale exchange.
    */
  case class StripBoilerplate(
      child: Expression, separator: String, fps: Array[Long])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    private lazy val sepBytes =
      separator.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override def nullSafeEval(input: Any): Any =
      stripBoilerplateEval(input.asInstanceOf[UTF8String], sepBytes, fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
      val fpsRef = ctx.addReferenceObj("fps", fps, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.stripBoilerplateEval($c, $sepRef, $fpsRef)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def fpHi(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
  private def fpLo(d: Array[Byte]): Long = {
    var v = 0L
    var i = 8
    while (i < 16) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Flatten + sort 16-byte fingerprints into the (hi, lo) pair array
    * [[StripBoilerplate]] binary-searches. Signed long comparison on both
    * halves — consistency between sort and search is all that matters.
    */
  def sortedFpPairs(fps: Array[Array[Byte]]): Array[Long] = {
    val pairs = fps.map(d => (fpHi(d), fpLo(d))).sorted
    val flat = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      flat(2 * i) = pairs(i)._1
      flat(2 * i + 1) = pairs(i)._2
      i += 1
    }
    flat
  }

  private def containsPair(fps: Array[Long], hi: Long, lo: Long): Boolean = {
    var a = 0
    var b = fps.length / 2 - 1
    while (a <= b) {
      val mid = (a + b) >>> 1
      val mh = fps(2 * mid)
      val ml = fps(2 * mid + 1)
      val c =
        if (mh < hi) -1 else if (mh > hi) 1
        else if (ml < lo) -1 else if (ml > lo) 1 else 0
      if (c == 0) return true
      if (c < 0) a = mid + 1 else b = mid - 1
    }
    false
  }

  /** Static hot loop for [[StripBoilerplate]]; called from generated code. */
  def stripBoilerplateEval(
      input: UTF8String, sep: Array[Byte], fps: Array[Long]): UTF8String = {
    val bytes = input.getBytes
    val md = md5Local.get()
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var first = true
    var from = 0
    var done = false
    while (!done) {
      val idx = indexOfBytes(bytes, from, sep)
      val end = if (idx < 0) bytes.length else idx
      md.update(bytes, from, end - from)
      val d = md.digest()
      if (!containsPair(fps, fpHi(d), fpLo(d))) {
        if (!first) out.write(sep, 0, sep.length)
        out.write(bytes, from, end - from)
        first = false
      }
      if (idx < 0) done = true else from = idx + sep.length
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Parse 32-hex-char md5 strings (Spark's `md5()` output) into the
    * sorted (hi, lo) pair array the row-local match passes binary-search.
    * Big-endian halves, consistent with [[sortedFpPairs]]'s byte fold. */
  def sortedFpPairsFromHex(fps: Array[String]): Array[Long] = {
    val pairs = fps.map { h =>
      require(h.length == 32, s"not an md5 hex fingerprint: $h")
      (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16))
    }.sorted
    val flat = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      flat(2 * i) = pairs(i)._1
      flat(2 * i + 1) = pairs(i)._2
      i += 1
    }
    flat
  }

  /** Per-document benchmark-gram collision statistics in ONE row pass:
    * `(n_grams, matched_grams)` over the document's DISTINCT word
    * k-shingles ([[shingleSetEval]] — identical tokenization/dedup to
    * [[ShingleSet]]), matching each gram's md5 against the sorted bench
    * fingerprint pairs shipped with the plan. Replaces
    * [[graft.ops.Curation.contaminationReport]]'s corpus-scale
    * (id, gram) exchange read twice (size aggregate + broadcast
    * semi-join) — the same fat-exchange disease the round-13 strip
    * rewrite removed, and the composed-chain ladder's dominant stage
    * (q63.decon: 9.0 GB shuffle, 125 s at 8M docs).
    */
  case class GramMatchStats(child: Expression, k: Int, fps: Array[Long])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_grams", LongType, nullable = false),
      StructField("matched_grams", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      gramMatchStatsEval(input.asInstanceOf[UTF8String], k, fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fpsRef = ctx.addReferenceObj("fps", fps, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.gramMatchStatsEval($c, $k, $fpsRef)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Static hot loop for [[GramMatchStats]]; called from generated code. */
  def gramMatchStatsEval(input: UTF8String, k: Int,
      fps: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val grams = shingleSetEval(input, k)
    val md = md5Local.get()
    var matched = 0L
    var i = 0
    val n = grams.numElements()
    while (i < n) {
      val b = grams.getUTF8String(i).getBytes
      md.update(b)
      val d = md.digest()
      if (containsPair(fps, fpHi(d), fpLo(d))) matched += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, matched))
  }

  def gramMatchStats(text: Column, k: Int, fps: Array[Long]): Column =
    ColumnBridge.column(
      GramMatchStats(ColumnBridge.expression(text), k, fps))

  /** RAW text-quality counts in ONE codegen row pass:
    * `(n_tokens, sum_word_len, n_chars, n_punct, n_stopwords)`. The
    * ratio/score ARITHMETIC stays in Column expressions (same casts,
    * divisions and rounding as the original composable forms, so float
    * results — and DuckDB oracle hashes — are bit-identical); only the
    * per-character/per-token WORK moves into the loop. The composable
    * forms ([[graft.functions.TextFunctions]] `tokenCount`/`meanWordLen`/
    * `punctRatio`/`stopwordRatio`) build on higher-order-function lambdas,
    * which are CodegenFallback: ONE of them in a Project evicts the whole
    * projection from whole-stage codegen onto the interpreted path — the
    * round-13 q77.quality regression (8.96 → 20.6 s at 2M docs) was
    * exactly that eviction pulling the merged RepetitionStats along.
    *
    * Semantics replicated exactly: tokens = lowercase, Java `\s` split,
    * empties dropped ([[isWs]] is the `\s` set); lengths count Unicode
    * CODE POINTS (Spark's `length` = UTF8String.numChars); punct is Java
    * regex `\p{Punct}` = the 32 ASCII punctuation characters; stopword
    * membership compares whole lowercased tokens. NULL text → all-zero
    * counts (nullable=false) so every field reference is unconditional
    * and codegen subexpression elimination evaluates the pass once per
    * row however many signals read it.
    */
  case class TextStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("sum_word_len", LongType, nullable = false),
      StructField("n_chars", IntegerType, nullable = false),
      StructField("n_punct", IntegerType, nullable = false),
      StructField("n_stopwords", IntegerType, nullable = false)))
    override def nullable: Boolean = false

    private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stopwords.foreach(s.add)
      s
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      textStatsEval(
        if (v == null) null else v.asInstanceOf[UTF8String], stopSet)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val stopRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
            graft.functions.HashExpressions.textStatsEval(
              ${c.isNull} ? null : ${c.value}, $stopRef);""",
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private val zeroTextStats =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0, 0L, 0, 0, 0))

  /** Java regex `\p{Punct}`: the 32 ASCII punctuation characters. */
  private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  /** Static hot loop for [[TextStats]]; called from generated code. */
  def textStatsEval(input: UTF8String,
      stop: java.util.HashSet[String]): org.apache.spark.sql.catalyst.InternalRow = {
    if (input == null) return zeroTextStats
    // n_chars / n_punct walk the ORIGINAL text (punctRatio's semantics);
    // counts are code points, matching Spark's length = numChars
    val raw = input.toString
    var nChars = 0
    var nPunct = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if (cp < 128 && isAsciiPunct(cp.toChar)) nPunct += 1
      i += Character.charCount(cp)
    }
    // tokens walk the LOWERCASED text (tokens()'s semantics)
    val text = input.toLowerCase.toString
    var nTokens = 0
    var sumWordLen = 0L
    var nStop = 0
    var j = 0
    val n = text.length
    while (j < n) {
      while (j < n && isWs(text.charAt(j))) j += 1
      val start = j
      while (j < n && !isWs(text.charAt(j))) j += 1
      if (j > start) {
        nTokens += 1
        sumWordLen += text.codePointCount(start, j)
        if (stop.contains(text.substring(start, j))) nStop += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, sumWordLen, nChars, nPunct, nStop))
  }

  def textStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text), stopwords))

  def distinctSegmentFps(text: Column, separator: String): Column =
    ColumnBridge.column(
      DistinctSegmentFps(ColumnBridge.expression(text), separator))

  def stripBoilerplate(text: Column, separator: String,
      fps: Array[Long]): Column =
    ColumnBridge.column(
      StripBoilerplate(ColumnBridge.expression(text), separator, fps))
}
