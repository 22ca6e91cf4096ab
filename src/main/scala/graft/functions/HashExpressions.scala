package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * JVM loop inside (CodegenFallback costs one virtual call per row —
  * irrelevant next to the loop). Semantics match the composable versions
  * exactly: MinHashSig's minima are lexicographic minimums of lowercase
  * md5-hex strings, identical to `min(md5(j || ':' || shingle))` in any
  * ANSI engine, so DuckDB oracles are unaffected.
  */
object HashExpressions {

  /** MinHash signature: for j in 0 until numHashes, the lexicographically
    * smallest `md5Hex(j + ":" + shingle)` over the input shingle array.
    * Null/empty input → null.
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
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

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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

  /** 64-bit SimHash over a token array: bit i set when the sum over tokens
    * of ±1 (bit i of the token's 64-bit hash) is positive. Hash is the same
    * xxhash64(seed 42) Spark's `xxhash64` function computes, so results
    * match the composable formulation.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(s, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
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

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
