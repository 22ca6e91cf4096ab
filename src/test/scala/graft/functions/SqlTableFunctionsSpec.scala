package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL table-function surface: the set-containment joins and the
  * as-of join callable from FROM clauses, producing exactly the Column
  * API's results (the builders return the same logical plan).
  */
class SqlTableFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sql-tvf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("graft_subset_join / graft_either_subset_join from SQL ≡ Column API") {
    GraftFunctions.register(spark)
    // rule sets: h1 = {s1, s2}; h2 = {s1, s2, s3}
    val rules = Seq(("h1", "s1"), ("h1", "s2"),
      ("h2", "s1"), ("h2", "s2"), ("h2", "s3")).toDF("hap", "snp")
    // observations: p1 = {s1, s2} (⊇ h1, ⊂ h2); p2 = {s1} (⊂ both)
    val obs = Seq(("p1", "s1"), ("p1", "s2"), ("p2", "s1")).toDF("pat", "snp")
    rules.createOrReplaceTempView("rules")
    obs.createOrReplaceTempView("obs")

    val subsetSql = spark.sql(
      "SELECT * FROM graft_subset_join('rules', 'obs', 'snp', 'hap', 'pat')" +
        " ORDER BY hap, pat")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val subsetApi = graft.ops.SetContainment.selectWhereSubsetOf(
        rules, obs, Seq("snp"), Seq("hap"), Seq("pat"))
      .orderBy("hap", "pat")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(subsetSql == subsetApi)
    assert(subsetSql == Seq(("h1", "p1"))) // only h1 ⊆ p1

    val eitherSql = spark.sql(
      "SELECT * FROM graft_either_subset_join(" +
        "'rules', 'obs', 'snp', 'hap', 'pat') ORDER BY hap, pat")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val eitherApi = graft.ops.SetContainment.selectWhereEitherSubsetOf(
        rules, obs, Seq("snp"), Seq("hap"), Seq("pat"))
      .orderBy("hap", "pat")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(eitherSql == eitherApi)
    // either-direction adds p1 ⊆ h2 and p2 ⊆ h1/h2
    assert(eitherSql ==
      Seq(("h1", "p1"), ("h1", "p2"), ("h2", "p1"), ("h2", "p2")))
  }

  test("graft_asof_join from SQL ≡ Column API, with and without tolerance") {
    GraftFunctions.register(spark)
    // tolerance compares event TIME — the fixture uses real timestamps
    // (the tolerance path is defined on TIMESTAMP columns)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val trades = Seq(("A", ts(10), 100.0), ("A", ts(20), 101.0),
      ("B", ts(15), 50.0)).toDF("sym", "t_ts", "price")
    val orders = Seq(("A", ts(12), 5), ("A", ts(25), 7), ("B", ts(14), 2))
      .toDF("sym", "o_ts", "qty")
    orders.createOrReplaceTempView("orders")
    trades.createOrReplaceTempView("trades")

    def viaSql(tol: String) = spark.sql(
      s"SELECT * FROM graft_asof_join('orders', 'o_ts', 'trades', 't_ts'," +
        s" 'sym'$tol) ORDER BY sym, o_ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getInt(2), Option(r.get(3)), Option(r.get(4)))).toSeq
    def viaApi(tol: Option[Long]) = graft.ops.TemporalJoins.asofJoin(
        orders, "o_ts", trades, "t_ts", Seq("sym"), tol)
      .orderBy("sym", "o_ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getInt(2), Option(r.get(3)), Option(r.get(4)))).toSeq

    assert(viaSql("") == viaApi(None))
    // B's order at 14 precedes B's only trade at 15 → null match
    assert(viaSql("").map(x => (x._1, x._2, x._4.isDefined)) ==
      Seq(("A", 12L, true), ("A", 25L, true), ("B", 14L, false)))
    // tolerance 3: A@25 matched trade@20 (gap 5) gets nulled back out
    assert(viaSql(", 3") == viaApi(Some(3L)))
    assert(viaSql(", 3").map(x => (x._1, x._2, x._4.isDefined)) ==
      Seq(("A", 12L, true), ("A", 25L, false), ("B", 14L, false)))
  }

  test("graft_pivot from SQL ≡ Column API (good rows; bad groups diverted)") {
    GraftFunctions.register(spark)
    val geno = Seq(
      ("p1", "g1", "A", "*1"), ("p1", "g1", "B", "*2"), // clean pair
      ("p2", "g1", "A", "*3"),                          // short: null pad
      ("p3", "g1", "A", "*1"), ("p3", "g1", "B", "*2"),
      ("p3", "g1", "C", "*3"))                          // wide: bad group
      .toDF("patient_id", "gene", "chromosome", "haplotype")
    geno.createOrReplaceTempView("geno")
    val viaSql = spark.sql(
      "SELECT * FROM graft_pivot('geno', 'patient_id,gene', " +
        "'patient_id=>patient_id, gene=>gene, haplotype->hap1|hap2', " +
        "'chromosome') ORDER BY patient_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    val (good, bad) = graft.ops.GroupedRowsToColumns(geno,
      Seq("patient_id", "gene"),
      Seq(graft.ops.GroupedRowsToColumns.Passthrough("patient_id", "patient_id"),
        graft.ops.GroupedRowsToColumns.Passthrough("gene", "gene"),
        graft.ops.GroupedRowsToColumns.Spread("haplotype",
          Seq("hap1", "hap2"))),
      Seq("chromosome"))
    val viaApi = good.orderBy("patient_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    assert(viaSql == viaApi)
    assert(viaSql == Seq(
      ("p1", "g1", Some("*1"), Some("*2")),
      ("p2", "g1", Some("*3"), None)))     // p3 diverted to bad groups
    assert(bad.select("patient_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("p3"))
  }

  test("graft_condensed_join from SQL ≡ Column API (USING chain + " +
      "duplicate-key blanking)") {
    GraftFunctions.register(spark)
    val recs = Seq((1L, "codeine"), (2L, "warfarin")).toDF("id", "drug")
    val pheno = Seq(("p1", 1L, "poor"), ("p1", 2L, "fast"),
      ("p2", 1L, "poor")).toDF("patient_id", "drug_recommendation_id",
      "phenotype")
    recs.createOrReplaceTempView("recs")
    pheno.createOrReplaceTempView("pheno")
    import graft.report.CondensedJoin
    val spec = CondensedJoin.Spec(
      select = Seq("pheno" -> Seq("patient_id", "phenotype"),
        "recs" -> Seq("drug")),
      root = "pheno",
      joins = Seq(CondensedJoin.Join("recs", "left",
        _ => CondensedJoin.col2("pheno", "drug_recommendation_id") ===
          CondensedJoin.col2("recs", "id"))),
      duplicateKey = Map("pheno" -> Seq(CondensedJoin.Own("patient_id"))))
    // the TVF encodes the same spec: recs joins USING-style would need a
    // shared column name, so rename id -> drug_recommendation_id for the
    // SQL view (the USING subset the TVF supports)
    recs.withColumnRenamed("id", "drug_recommendation_id")
      .createOrReplaceTempView("recs2")
    val viaSql = spark.sql(
      "SELECT * FROM graft_condensed_join(" +
        "'pheno:patient_id|phenotype,recs2:drug', 'pheno', " +
        "'recs2:left:drug_recommendation_id', " +
        "'pheno:own.patient_id') ORDER BY pheno__patient_id, recs2__drug")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getString(2)))).toSeq
    val apiSpec = CondensedJoin.Spec(
      select = Seq("pheno" -> Seq("patient_id", "phenotype"),
        "recs2" -> Seq("drug")),
      root = "pheno",
      joins = Seq(CondensedJoin.Join("recs2", "left",
        have => CondensedJoin.usingOn(have, "recs2",
          Seq("drug_recommendation_id")))),
      duplicateKey = Map("pheno" -> Seq(CondensedJoin.Own("patient_id"))))
    val viaApi = CondensedJoin.condensed(apiSpec, Map(
        "pheno" -> pheno,
        "recs2" -> recs.withColumnRenamed("id", "drug_recommendation_id")))
      .orderBy("pheno__patient_id", "recs2__drug")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getString(2)))).toSeq
    assert(viaSql == viaApi)
    // spec with the explicit-condition Column API agrees on the data too
    val viaExplicit = CondensedJoin.condensed(spec,
        Map("pheno" -> pheno, "recs" -> recs))
      .orderBy("pheno__patient_id", "recs__drug")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getString(2)))).toSeq
    assert(viaSql == viaExplicit)
  }

  test("graft_strip_boilerplate from SQL ≡ Column API, integer and " +
      "fractional thresholds") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "h a b"), (2L, "h c"), (3L, "h a"), (4L, "h"), (5L, "q q"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("strip_docs")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // absolute threshold: df("h") = 4 ≥ 3
    val sqlAbs = collect(spark.sql(
      "SELECT * FROM graft_strip_boilerplate(" +
        "'strip_docs', 'doc_id', 'text', ' ', 3)"))
    assert(sqlAbs == collect(graft.ops.Curation.stripBoilerplate(
      docs, "doc_id", "text", " ", 3)))
    // fractional threshold: 5 × 0.8 = exactly 4.0 must still catch "h"
    // (the SQL decimal literal rides the in-plan exact-decimal cut)
    val sqlFrac = collect(spark.sql(
      "SELECT * FROM graft_strip_boilerplate(" +
        "'strip_docs', 'doc_id', 'text', ' ', 0.8)"))
    assert(sqlFrac == collect(graft.ops.Curation.stripBoilerplate(
      docs, "doc_id", "text", " ", Right(0.8))))
    assert(sqlFrac == Set(
      (1L, "a b"), (2L, "c"), (3L, "a"), (4L, ""), (5L, "q q")))
  }

  test("graft_decontaminate from SQL ≡ Column API") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "a b c d"), (2L, "x y z"), (3L, "a"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e")).toDF("bench_id", "text")
    docs.createOrReplaceTempView("decon_docs")
    bench.createOrReplaceTempView("decon_bench")
    val viaSql = spark.sql(
      "SELECT doc_id FROM graft_decontaminate('decon_docs', 'doc_id', " +
        "'text', 'decon_bench', 'text', 2) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val viaApi = graft.ops.Curation.decontaminate(
        docs, "doc_id", "text", bench, "text", n = 2)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi)
    assert(viaSql == Seq(2L, 3L)) // doc 1 shares the "b c"/"c d" grams
  }

  test("graft_minhash_pairs from SQL ≡ Column API") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different text about spark and shuffles"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("mh_docs")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaSql = collect(spark.sql(
      "SELECT * FROM graft_minhash_pairs('mh_docs','doc_id','text',0.4)"))
    val viaApi = collect(graft.ops.Dedup.minHashNearDuplicates(
      docs, "doc_id", "text", threshold = 0.4))
    assert(viaSql == viaApi && viaSql.nonEmpty)
    assert(viaSql.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    // non-default knobs pass through positionally
    val knobs = collect(spark.sql("SELECT * FROM graft_minhash_pairs(" +
      "'mh_docs','doc_id','text',0.4, 8, 4, 3, 100)"))
    assert(knobs == viaApi)
  }

  test("graft_exact_dedup from SQL ≡ Column API") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (2L, "Some  Text"), (1L, "some text"), (3L, "other"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ed_docs")
    val viaSql = spark.sql(
      "SELECT doc_id FROM graft_exact_dedup('ed_docs','doc_id','text') " +
        "ORDER BY doc_id").collect().map(_.getLong(0)).toSeq
    val viaApi = graft.ops.Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi)
    assert(viaSql == Seq(1L, 3L)) // doc 2 is a normalized duplicate of 1
  }

  test("graft_funnel / graft_cohort_retention / graft_scd2 from SQL " +
      "≡ Column API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, floor, to_timestamp}
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "signup", 1L, 5.0),
      (1L, "2024-01-01 10:05:00", "click", 2L, 15.0),
      (1L, "2024-01-01 10:10:00", "purchase", 3L, 15.0),
      (2L, "2024-01-02 09:00:00", "signup", 4L, 25.0),
      (2L, "2024-01-09 09:00:00", "click", 5L, 35.0))
      .toDF("user_id", "tss", "event_type", "event_id", "value")
      .select(col("user_id"),
        to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("event_id"), col("value"))
    ev.createOrReplaceTempView("ea_events")
    // funnel
    val fSql = spark.sql("SELECT * FROM graft_funnel('ea_events', " +
        "'event_type', 'ts', 'event_id', 'user_id', 'signup,click,purchase')")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    val fApi = graft.ops.EventAnalytics.funnelReport(ev, "event_type",
        "ts", "event_id", "user_id", Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(fSql == fApi && fSql == Seq((1, 2L), (2, 2L), (3, 1L)))
    // cohort retention
    val cSql = spark.sql("SELECT * FROM graft_cohort_retention(" +
        "'ea_events', 'ts', 'user_id') ORDER BY cohort_week, week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    val cApi = graft.ops.EventAnalytics.cohortRetention(ev, "ts", "user_id")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(cSql == cApi && cSql.nonEmpty)
    // scd2 over the value tier
    val src = ev.select(col("user_id"), col("ts"), col("event_id"),
      floor(col("value") / 10).cast("long").as("tier"))
    src.createOrReplaceTempView("ea_src")
    val sSql = spark.sql("SELECT * FROM graft_scd2('ea_src', 'user_id', " +
        "'ts', 'event_id', 'tier') ORDER BY user_id, version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSeq
    val sApi = graft.ops.TemporalJoins.scd2Build(src, Seq("user_id"),
        "ts", "event_id", Seq("tier"))
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSeq
    assert(sSql == sApi && sSql == Seq((1L, 0L, 1), (1L, 1L, 2),
      (2L, 2L, 1), (2L, 3L, 2)))
  }

  test("graft_bm25_topk / graft_rrf_fuse from SQL ≡ Column API") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "spark shuffle join speed"), (2L, "parquet scan filter pushdown"),
      (3L, "spark window aggregate"), (4L, "join filter spark"),
      (5L, "window shuffle merge table")).toDF("doc_id", "text")
    val queries = Seq((0L, "spark join"), (1L, "filter scan"))
      .toDF("query_id", "query_text")
    docs.createOrReplaceTempView("rt_docs")
    queries.createOrReplaceTempView("rt_queries")
    val bSql = spark.sql("SELECT * FROM graft_bm25_topk('rt_docs', " +
        "'doc_id', 'text', 'rt_queries', 'query_id', 'query_text', 3) " +
        "ORDER BY query_id, rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val bApi = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "query_text", 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(bSql == bApi && bSql.nonEmpty)

    // two tiny rankings as views; the fused result must equal rrfFuse
    val ra = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 3L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val rb = Seq((0L, 2L, 1L), (0L, 1L, 2L), (1L, 4L, 1L))
      .toDF("query_id", "doc_id", "rank")
    ra.createOrReplaceTempView("rt_ra")
    rb.createOrReplaceTempView("rt_rb")
    val fSql = spark.sql("SELECT * FROM graft_rrf_fuse('rt_ra', 'a', " +
        "'rt_rb', 'b', 'doc_id', 5) ORDER BY query_id, rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val fApi = graft.ops.Retrieval.rrfFuse(
        Seq("a" -> ra, "b" -> rb), "doc_id", 5)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(fSql == fApi && fSql.nonEmpty)
    // doc seen by both rankings fuses both contributions and ranks first
    assert(fSql.head._1 == 0L && fSql.take(2).map(_._2).toSet == Set(1L, 2L))
  }

  test("table-function misuse fails loud: wrong arity, unknown view") {
    GraftFunctions.register(spark)
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_subset_join('a', 'b', 'c')").collect()
    }
    assert(wrongArity.getMessage.contains("graft_subset_join"))
    val unknown = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof_join(" +
        "'no_such_view', 't', 'also_missing', 't', 'k')").collect()
    }
    assert(unknown.getMessage.toLowerCase.contains("no_such_view") ||
      unknown.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
