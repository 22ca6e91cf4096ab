package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for the dedup/fingerprint paths.
  *
  * Visually identical text can differ at the codepoint level — `é` as one
  * composed codepoint (U+00E9) vs `e` + combining acute (U+0065 U+0301) —
  * which defeats exact dedup, fingerprinting, and n-gram decontamination
  * (the md5s differ, the shingles differ). Web corpora mix both forms
  * freely (different editors, OCR, platform conventions), so canonical
  * normalization BEFORE fingerprinting is a standard curation step.
  *
  * `NFC` (canonical composition) is the interchange default and matches
  * SQL engines' `nfc_normalize`, so oracles reproduce it exactly. `NFKC`
  * additionally folds compatibility forms (ﬁ → fi, ① → 1, full-width →
  * ASCII) — the more aggressive fold LLM tokenizer pipelines often want.
  * Codegen: a static call into `java.text.Normalizer`, same pattern as
  * [[HashExpressions]], so the expression stays inside whole-stage spans.
  */
object UnicodeExpressions {

  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    private val jform = java.text.Normalizer.Form.valueOf(form)
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override def nullSafeEval(input: Any): Any =
      normalizeEval(input.asInstanceOf[UTF8String], jform.name())

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"""graft.functions.UnicodeExpressions.normalizeEval($c, "${jform.name()}")""")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static normalization body; called from generated code. Already-
    * normalized text (the overwhelmingly common case — ASCII, composed
    * NFC) short-circuits without allocating.
    */
  def normalizeEval(input: UTF8String, form: String): UTF8String = {
    val s = input.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  /** Canonical composition (NFC) — SQL engines' `nfc_normalize`. */
  def nfc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), "NFC"))

  /** Compatibility composition (NFKC) — ligature/width/symbol folding. */
  def nfkc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), "NFKC"))
}
