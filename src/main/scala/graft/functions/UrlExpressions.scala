package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass codegen expressions for URL canonicalization — the native
  * fast path under [[graft.ops.Web]].
  *
  * The composable formulation ([[graft.ops.Web.canonicalizeUrlColumns]])
  * executes ~12 regex engines per row; at crawl scale canonicalization
  * fronts EVERY pipeline, so the scan projection is worth a tight loop.
  * These expressions parse once per row with zero regex machinery and
  * implement `doGenCode` as a static call, keeping the enclosing
  * Project inside the whole-stage codegen span. Semantics are
  * bit-identical to the Column chain (same rule set, same space-only
  * trim, same UTF8 lowercase, same bytewise parameter sort) — proven by
  * `WebSpec`'s randomized differential and, independently, by the q142/
  * q143/q146 DuckDB oracles, which replay the rules from scratch.
  */
object UrlExpressions {

  case class UrlCanonicalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      canonicalizeEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.UrlExpressions.canonicalizeEval($c);
        ${ev.isNull} = (${ev.value} == null);
      """)

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class UrlHost(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      hostEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.UrlExpressions.hostEval($c)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Tracking keys dropped from query strings: `utm_` prefix plus the
    * exact keys. Must stay in lockstep with Web.trackingKeyRe and the
    * DuckDB oracle literal. */
  private def isTrackingKey(k: String): Boolean =
    k.startsWith("utm_") || k == "gclid" || k == "fbclid" ||
      k == "msclkid" || k == "ref" || k == "mc_eid" || k == "igshid"

  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** Parsed `scheme://netloc path [?query]`; `ok=false` when the input
    * doesn't open with `scheme://`. */
  private final class Parts(
      val ok: Boolean, val scheme: String, val host: String,
      val port: String, val path: String, val query: String)

  private val NoParts = new Parts(false, "", "", "", "", "")

  /** The rule set of [[graft.ops.Web]], one pass, no regexes. */
  private def parse(raw: String): Parts = {
    // space-only trim — what Spark's / DuckDB's trim() removes
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val u = raw.substring(lo, hi)
    // scheme: [A-Za-z][A-Za-z0-9+.-]* then "://" (maximal munch is safe:
    // the scheme alphabet contains neither ':' nor '/')
    if (u.isEmpty) return NoParts
    val c0 = u.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return NoParts
    var i = 1
    while (i < u.length && {
      val c = u.charAt(i)
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
    }) i += 1
    if (i + 3 > u.length || u.charAt(i) != ':' || u.charAt(i + 1) != '/' ||
      u.charAt(i + 2) != '/') return NoParts
    val scheme = lower(u.substring(0, i))
    i += 3
    // netloc: up to '/', '?' or '#'
    val nlStart = i
    while (i < u.length && {
      val c = u.charAt(i); c != '/' && c != '?' && c != '#'
    }) i += 1
    var netloc = lower(u.substring(nlStart, i))
    // userinfo: strip through the FIRST '@' (the `^[^@]*@` rule)
    val at = netloc.indexOf('@')
    if (at >= 0) netloc = netloc.substring(at + 1)
    // trailing `:digits*` → port (kept only when ≥1 digit)
    var host = netloc
    var port = ""
    var j = netloc.length
    while (j > 0 && { val c = netloc.charAt(j - 1); c >= '0' && c <= '9' })
      j -= 1
    if (j > 0 && netloc.charAt(j - 1) == ':') {
      port = netloc.substring(j) // may be "" for a bare trailing ':'
      host = netloc.substring(0, j - 1)
    }
    // IDEMPOTENT strips (round-11 review): every `www.` layer and every
    // trailing root-dot go, so re-canonicalizing already-canonical data
    // is a no-op — `www.www.x.com` and `x.com..` reach their fixpoint in
    // one pass. Order: prefix layers first, then trailing dots (a prefix
    // strip can expose trailing dots, never vice versa).
    while (host.startsWith("www.")) host = host.substring(4)
    var he = host.length
    while (he > 0 && host.charAt(he - 1) == '.') he -= 1
    if (he < host.length) host = host.substring(0, he)
    // path: up to '?' or '#'
    val pStart = i
    while (i < u.length && { val c = u.charAt(i); c != '?' && c != '#' })
      i += 1
    val path = u.substring(pStart, i)
    // query only when '?' precedes any '#'
    var query = ""
    if (i < u.length && u.charAt(i) == '?') {
      val qStart = i + 1
      i = qStart
      while (i < u.length && u.charAt(i) != '#') i += 1
      query = u.substring(qStart, i)
    }
    new Parts(true, scheme, host, port, path, query)
  }

  /** Canonical numeric form of a digits-only port string: leading zeros
    * stripped (`080` → `80`, `000` → `0`, `` stays ``) — pure string
    * arithmetic, so a 20-digit junk port cannot overflow anything and
    * the default-port comparison below is effectively numeric
    * (round-11 review: the string compare kept `:080` where `:80`
    * dropped — same page, two canonical keys). */
  private def canonicalPort(port: String): String = {
    var i = 0
    while (i < port.length - 1 && port.charAt(i) == '0') i += 1
    port.substring(i)
  }

  /** Java-friendly static for generated code: canonical URL or null. */
  def canonicalizeEval(input: UTF8String): UTF8String = {
    val p = parse(input.toString)
    canonicalOf(p, input.numChars())
  }

  /** Canonical URL from parsed parts (one shared builder for the
    * canonicalize and parts expressions). */
  private def canonicalOf(p: Parts, sizeHint: Int): UTF8String = {
    if (!p.ok || p.scheme.isEmpty || p.host.isEmpty) return null
    val sb = new java.lang.StringBuilder(sizeHint)
    sb.append(p.scheme).append("://").append(p.host)
    val port = canonicalPort(p.port)
    if (port.nonEmpty &&
      !((p.scheme == "http" && port == "80") ||
        (p.scheme == "https" && port == "443")))
      sb.append(':').append(port)
    var pathEnd = p.path.length
    while (pathEnd > 0 && p.path.charAt(pathEnd - 1) == '/') pathEnd -= 1
    if (pathEnd == 0) sb.append('/') else sb.append(p.path, 0, pathEnd)
    if (p.query.nonEmpty) {
      val parts = p.query.split("&", -1)
      val kept = new java.util.ArrayList[UTF8String](parts.length)
      var i = 0
      while (i < parts.length) {
        val part = parts(i)
        if (part.nonEmpty) {
          val eq = part.indexOf('=')
          val key = if (eq >= 0) part.substring(0, eq) else part
          // case-insensitive key match (round-11 review: `UTM_Source=`
          // survived the case-sensitive rule); the PARAM ITSELF keeps
          // its case — only the classification lowercases
          if (!isTrackingKey(lower(key))) kept.add(UTF8String.fromString(part))
        }
        i += 1
      }
      if (!kept.isEmpty) {
        // bytewise (UTF-8 binary) order — what array_sort/list_sort do
        java.util.Collections.sort(kept)
        sb.append('?')
        var k = 0
        while (k < kept.size()) {
          if (k > 0) sb.append('&')
          sb.append(kept.get(k).toString)
          k += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Canonical host, '' for non-URLs (regexp_extract semantics). */
  def hostEval(input: UTF8String): UTF8String = {
    val p = parse(input.toString)
    UTF8String.fromString(if (p.ok) p.host else "")
  }

  /** (host, canonical) from ONE parse — for consumers that need both
    * ([[graft.ops.Web.hostReport]]); separate UrlHost + UrlCanonicalize
    * calls would parse every row twice (subexpression elimination cannot
    * merge two DIFFERENT expressions). */
  def partsEval(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val p = parse(input.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        UTF8String.fromString(if (p.ok) p.host else ""),
        canonicalOf(p, input.numChars())))
  }

  /** Struct-returning single-parse expression: `(host, canonical)`. */
  case class UrlParts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("host", StringType, nullable = false),
      StructField("canonical", StringType, nullable = true)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      partsEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.UrlExpressions.partsEval($c);
      """)

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def urlCanonicalize(url: Column): Column =
    ColumnBridge.column(UrlCanonicalize(ColumnBridge.expression(url)))

  def urlHost(url: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(url)))

  def urlParts(url: Column): Column =
    ColumnBridge.column(UrlParts(ColumnBridge.expression(url)))
}
