package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization: hand-computed rule matrix, idempotence, and the
  * host-report collapse arithmetic.
  */
class WebSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-web-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq

  test("canonicalizeUrl: rule matrix, one case per rule") {
    val got = canon(
      // case-folding scheme+host, default http port, tracking param,
      // param sort, fragment, trailing slash
      "HTTP://WWW.News.Example.COM:80/Docs/7/?utm_source=feed&b=2&a=1#x",
      // https default port + userinfo strip
      "https://u:p@news.example.com:443/docs/7",
      // non-default port kept; www stripped
      "http://www.news.example.com:8080/path?ref=tw&z=9&y=8",
      // root-dot host, surrounding whitespace, emptied-query '?' drop,
      // param-key case preserved
      "  https://news.example.com./docs?fbclid=1&Q=3  ",
      // path case preserved; repeated trailing slashes
      "https://cdn.example.com/A/Page///?gclid=xyz",
      // empty path becomes /
      "https://news.example.com",
      // query with valueless and empty params
      "https://news.example.com/?a&&b=1")
    assert(got == Seq(
      "http://news.example.com/Docs/7?a=1&b=2",
      "https://news.example.com/docs/7",
      "http://news.example.com:8080/path?y=8&z=9",
      "https://news.example.com/docs?Q=3",
      "https://cdn.example.com/A/Page",
      "https://news.example.com/",
      "https://news.example.com/?a&b=1"))
  }

  test("canonicalizeUrl: non-URLs yield NULL") {
    val got = Seq("not a url", "", "example.com/no-scheme", "http//bad")
      .toDF("url").select(Web.canonicalizeUrl(col("url")).isNull)
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val raw = Seq(
      "HTTP://WWW.A.Example.COM:80/X/?utm_source=f&b=2&a=1#x",
      "https://u:p@a.example.com:443/docs/7",
      "http://www.a.example.com:8080/path?ref=tw&z=9&y=8",
      "https://cdn.example.com/A/Page///?gclid=xyz")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("idempotent strips, numeric default ports, case-insensitive " +
      "tracking keys (round-12 rule fixes)") {
    val got = canon(
      // multiple www. layers + multiple root dots reach the fixpoint
      "https://www.www.x.example.com../a",
      // default ports compared numerically, whatever the digit spelling
      "http://x.example.com:080/a",
      "https://x.example.com:0443/a",
      // kept ports render in canonical numeric form
      "http://x.example.com:08080/a",
      // tracking keys match case-insensitively; surviving params keep case
      "https://x.example.com/p?UTM_Source=f&Z=1",
      "https://x.example.com/p?REF=t&z=1")
    assert(got == Seq(
      "https://x.example.com/a",
      "http://x.example.com/a",
      "https://x.example.com/a",
      "http://x.example.com:8080/a",
      "https://x.example.com/p?Z=1",
      "https://x.example.com/p?z=1"))
    // re-canonicalizing already-ingested canonical data is a no-op
    assert(canon(got: _*) == got)
  }

  test("urlHost strips userinfo, port, www, and root dot") {
    val got = Seq("HTTPS://u@WWW.Host.Example.ORG.:8443/x")
      .toDF("url").select(Web.urlHost(col("url"))).as[String].head()
    assert(got == "host.example.org")
  }

  test("codegen expression matches the Column-chain reference on random URLs") {
    // Adversarial fragments: userinfo '@'s, bare/multi colons, empty and
    // tracking params, fragments before queries, root dots, mixed case,
    // non-URLs, surrounding spaces.
    val rng = new scala.util.Random(17)
    val schemes = Seq("http", "HTTPS", "ftp", "x+y.z-1", "9bad", "")
    val hosts = Seq("WWW.Example.COM", "a.b.c.", "host", "u:p@Host", "@h",
      "h@@x", "", "www.")
    val ports = Seq("", ":80", ":443", ":8080", ":", ":0443", ":12:34", ":x1")
    val paths = Seq("", "/", "/A/b/", "///", "/p?x", "/p#y")
    val queries = Seq("", "?", "?a=1&utm_source=f&B=2", "?&&", "?ref=t",
      "?k", "?utm_x", "?z=1#f", "?Q=%20&q=+",
      // newline-bearing keys: Java '$' matches before a trailing '\n'
      // and '.' stops at one — (?s)\A...\z anchoring must keep the
      // Column path aligned with the codegen equals/startsWith path
      "?ref\n=1", "?utm_a\nb=2", "?ref\n&z=1", "?\nref=x")
    val frags = Seq("", "#f", "#?a=1")
    val urls = Seq.fill(4000) {
      val pad = if (rng.nextBoolean()) " " else ""
      pad + schemes(rng.nextInt(schemes.size)) +
        (if (rng.nextInt(10) == 0) ":/" else "://") +
        hosts(rng.nextInt(hosts.size)) + ports(rng.nextInt(ports.size)) +
        paths(rng.nextInt(paths.size)) + queries(rng.nextInt(queries.size)) +
        frags(rng.nextInt(frags.size)) + pad
    } ++ Seq("", "   ", "no url at all", "http://")
    val df = urls.toDF("url")
    val diff = df.select(
        Web.canonicalizeUrl(col("url")).as("fast"),
        Web.canonicalizeUrlColumns(col("url")).as("ref"),
        Web.urlHost(col("url")).as("hfast"),
        Web.urlHostColumns(col("url")).as("href"),
        col("url"))
      .filter(!(col("fast") <=> col("ref")) || !(col("hfast") <=> col("href")))
    assert(diff.count() == 0, diff.collect().take(5).mkString("\n"))
  }

  test("tracking-key match is exact-full-string: newline keys") {
    // "utm_a\nb" IS a tracking key (utm_ prefix); "ref\n" is NOT "ref".
    val got = canon(
      "https://h.example.com/p?utm_a\nb=1&z=2",
      "https://h.example.com/p?ref\n=1&z=2")
    assert(got == Seq(
      "https://h.example.com/p?z=2",
      "https://h.example.com/p?ref\n=1&z=2"))
    // and the Column reference agrees
    val ref = Seq("https://h.example.com/p?utm_a\nb=1&ref\n=2")
      .toDF("url").select(Web.canonicalizeUrlColumns(col("url")))
      .as[String].head()
    assert(ref == "https://h.example.com/p?ref\n=2")
  }

  test("hostCapSample: caps per host, deterministic under repartition") {
    val rows = (1L to 40L).map(i =>
      (i, s"https://h${i % 2}.example.com/p$i"))
    val df = rows.toDF("id", "url")
    val kept = Web.hostCapSample(df, "url", "id", maxPerHost = 7)
    assert(kept.count() == 14)
    assert(kept.select(Web.urlHost(col("url"))).distinct().count() == 2)
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = Web.hostCapSample(df.repartition(13), "url", "id", 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // small hosts keep everything; non-URLs are dropped
    val mixed = Seq((1L, "https://x.example.com/a"), (2L, "nope"))
      .toDF("id", "url")
    assert(Web.hostCapSample(mixed, "url", "id", 5)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("SQL surface: url_canonicalize / url_host registered") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT url_canonicalize('HTTP://WWW.X.COM:80/A/?utm_source=1&b=2#f'),
                url_host('https://u@WWW.Host.ORG.:8443/x')""")
      .as[(String, String)].head()
    assert(got == (("http://x.com/A?b=2", "host.org")))
  }

  test("hostReport: collapse arithmetic is exact integer ppm") {
    // 3 raw URLs on one host collapse to 1 page; 1 URL on another stays.
    val df = Seq(
      "https://a.example.com/p?utm_source=1",
      "https://a.example.com/p?utm_source=2",
      "https://a.example.com/p/",
      "https://b.example.com/q").toDF("url")
    val rows = Web.hostReport(df, "url")
      .orderBy("host").as[(String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      ("a.example.com", 3L, 1L, 666666L),
      ("b.example.com", 1L, 1L, 0L)))
  }
}
