package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host-level crawl statistics — the first
  * operators every crawl-curation pipeline runs before any dedup or
  * quality gate: two raw URLs that differ only in case, default port,
  * tracking parameters, fragments, or trailing slashes are the SAME
  * page, and every downstream exact-dedup / host-budget / robots-policy
  * decision keys on the canonical form.
  *
  * Everything here is a pure `Column` expression chain (regexp extracts
  * plus array HOFs — no UDFs, no shuffle): canonicalization runs inside
  * the scan projection at any scale, and the only shuffle in
  * [[Web.hostReport]] is its one hash aggregate on the canonical host.
  * The regex vocabulary is restricted to the dialect shared by Java
  * (Spark) and RE2 (DuckDB oracle): character classes, anchors,
  * alternation — no lookaround, no backreferences.
  *
  * Canonicalization rules (each deterministic and engine-portable):
  *   1. trim surrounding whitespace; parse `scheme://netloc path ?query
  *      #fragment` — inputs that don't parse (no scheme/host) yield NULL
  *   2. scheme and host lowercase; userinfo (`user:pass@`) stripped
  *   3. default ports dropped NUMERICALLY (`:80`/`:080` for http,
  *      `:443`/`:0443` for https); kept ports render with leading zeros
  *      stripped, so one page has one port spelling
  *   4. every leading `www.` layer and every trailing root-dot stripped
  *      from the host — idempotent, so re-canonicalizing
  *      already-canonical data is a no-op
  *   5. trailing slashes stripped from the path; empty path becomes `/`
  *      (path case is PRESERVED — paths are case-sensitive per RFC 3986)
  *   6. tracking parameters dropped (`utm_*`, gclid, fbclid, msclkid,
  *      ref, mc_eid, igshid — keys matched CASE-INSENSITIVELY, the
  *      surviving params keep their case), the rest sorted bytewise for
  *      a canonical parameter order; an emptied query drops its `?`
  *   7. fragment dropped
  */
object Web {

  /** Query parameters that never change page identity: analytics /
    * click-tracking tags. Matched against the FULL parameter key with
    * exact-text anchors (`\A`/`\z`, DOTALL): Java's default `$` matches
    * before a trailing newline and `.` stops at one, which would make a
    * key like `"ref\n"` or `"utm_a\nb"` classify differently from the
    * codegen fast path's `equals`/`startsWith`
    * ([[graft.functions.UrlExpressions]]) and from RE2 (DuckDB), whose
    * `^`/`$` are text anchors. `(?s)\A...\z` pins all three engines to
    * the same exact-full-string semantics. */
  private val trackingKeyRe =
    "(?s)\\A(utm_.*|gclid|fbclid|msclkid|ref|mc_eid|igshid)\\z"

  // Parse regexes in exact-text form: `\A`/`\z` anchors and DOTALL, so
  // a newline anywhere in a URL neither aborts the parse (Java '.'
  // stops at '\n') nor shifts an anchor (Java '$' matches before a
  // trailing '\n'). Keeps the Column chain bit-aligned with the
  // single-pass codegen parser and with RE2, whose '.' also stops at
  // '\n' but whose '^'/'$' are already text anchors.
  private val schemeRe = "(?s)\\A([A-Za-z][A-Za-z0-9+.-]*)://.*\\z"
  private val netlocRe = "(?s)\\A[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*\\z"
  private val pathRe   = "(?s)\\A[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*\\z"
  private val queryRe  =
    "(?s)\\A[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*).*\\z"

  /** Canonical host: lowercased, userinfo and port stripped, `www.`
    * prefix and root-dot dropped. '' for non-URLs. Single-pass codegen
    * expression ([[graft.functions.UrlExpressions.UrlHost]]). */
  def urlHost(url: Column): Column =
    graft.functions.UrlExpressions.urlHost(url)

  /** Canonical full URL per the object contract; NULL when the input
    * doesn't parse as `scheme://host...`. Single-pass codegen expression
    * ([[graft.functions.UrlExpressions.UrlCanonicalize]]) — one parse
    * per row instead of the ~12 regex executions of
    * [[canonicalizeUrlColumns]]; ~10× on the 2M-URL probe. The Column
    * chain remains as the independent reference the spec differentials
    * against (the DuckDB oracle replays the rules a third way). */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.UrlExpressions.urlCanonicalize(url)

  /** [[urlHost]] as built-in-function composition (reference semantics). */
  def urlHostColumns(url: Column): Column = {
    val netloc = lower(regexp_extract(trim(url), netlocRe, 1))
    val noInfo = regexp_replace(netloc, "\\A[^@]*@", "")
    val noPort = regexp_replace(noInfo, ":[0-9]*\\z", "")
    // idempotent strips: every www. layer, every trailing root-dot —
    // re-canonicalizing canonical data must be a no-op
    regexp_replace(regexp_replace(noPort, "\\A(www\\.)+", ""), "\\.+\\z", "")
  }

  /** [[canonicalizeUrl]] as built-in-function composition (reference
    * semantics for the differential; not the hot path). */
  def canonicalizeUrlColumns(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val host = urlHostColumns(url)
    val netloc = lower(regexp_extract(u, netlocRe, 1))
    val noInfo = regexp_replace(netloc, "\\A[^@]*@", "")
    val rawPort = regexp_extract(noInfo, ":([0-9]+)\\z", 1)
    // canonical numeric port form: leading zeros stripped (:080 ≡ :80),
    // so the default-port comparison is effectively numeric and kept
    // ports render one way — pure string ops, a junk 20-digit port
    // cannot overflow anything
    val zeroless = regexp_replace(rawPort, "\\A0+", "")
    val port = when(rawPort === "", lit(""))
      .otherwise(when(zeroless === "", lit("0")).otherwise(zeroless))
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val netlocOut = concat(host, when(keepPort, concat(lit(":"), port))
      .otherwise(lit("")))
    val rawPath = regexp_extract(u, pathRe, 1)
    val stripped = regexp_replace(rawPath, "/+\\z", "")
    val pathOut = when(stripped === "", lit("/")).otherwise(stripped)
    val rawQuery = regexp_extract(u, queryRe, 1)
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"), p =>
        (length(p) > 0) &&
          // case-insensitive KEY match; the param keeps its case
          !lower(element_at(split(p, "="), 1)).rlike(trackingKeyRe))),
      "&")
    val queryOut = when(kept === "", lit("")).otherwise(concat(lit("?"), kept))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), netlocOut, pathOut, queryOut))
  }

  /** Per-host crawl-budget cap: keep at most `maxPerHost` rows per
    * canonical host, selected by the library-wide deterministic
    * `(md5(id), id)` priority — the C4/RefinedWeb-style domain-diversity
    * rule that stops one mega-host from dominating a training mix.
    * Rows whose URL doesn't parse carry no host and are dropped.
    *
    * Scale shape: rides [[Sampling.perGroupSampleExact]]'s bounded
    * `CollectTopK` aggregate — per-host state is O(maxPerHost) at every
    * aggregation level including map-side partials, so a zipf-hot host
    * (the norm in crawls) costs the same as a cold one; no per-host sort
    * or window over the raw rows exists in the plan.
    */
  def hostCapSample(df: DataFrame, urlCol: String, idCol: String,
      maxPerHost: Int): DataFrame = {
    require(!df.columns.contains("__host"),
      "hostCapSample uses a '__host' working column; rename the input's")
    // id contract (inherited from perGroupSampleExact's winner join):
    // ids must be UNIQUE and NON-NULL — duplicate ids would multiply
    // rows past the cap through the winner join-back, NULL ids are never
    // selected. Corpus ids satisfy both by construction.
    val withHost = df.withColumn("__host", urlHost(col(urlCol)))
      .filter(col("__host").isNotNull && col("__host") =!= "")
    Sampling.perGroupSampleExact(withHost, idCol, "__host", maxPerHost)
      .drop("__host")
  }

  /** Per-host crawl statistics over a URL column: raw URL count, distinct
    * canonical pages, and the canonicalization-collapse rate in ppm
    * (integer arithmetic — exact in any engine). The host-budget /
    * domain-blocklist signal: a host whose raw URLs collapse heavily is
    * serving the same pages under churned tracking parameters.
    *
    * One projection + one hash aggregate on the canonical host (partials
    * combine map-side); rows that don't parse as URLs are dropped. At
    * crawl scale hosts are zipf-skewed — the aggregate state per host is
    * O(1) scalars except `n_pages`'s distinct, which rides the same
    * shuffle as a two-column (host, canonical) pre-distinct.
    */
  def hostReport(df: DataFrame, urlCol: String): DataFrame = {
    // ONE parse per row: the struct expression yields (host, canonical)
    // together — separate urlHost + canonicalizeUrl projections each
    // parse, doubling the hot projection's work (subexpression
    // elimination cannot merge two different expressions).
    val canon = df
      .select(graft.functions.UrlExpressions.urlParts(col(urlCol)).as("__p"))
      .select(col("__p.host").as("host"),
        col("__p.canonical").as("canonical"))
      .filter(col("canonical").isNotNull)
    canon
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("canonical")).as("n_pages"))
      .withColumn("collapse_ppm",
        expr("(n_urls - n_pages) * 1000000L div n_urls"))
  }
}
