package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived BM25 scenarios against the textbook formula. */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-retrieval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bm25TopK matches a hand-computed Lucene-form score") {
    // corpus: 3 docs; query 'cat' — df(cat)=2, N=3, avgdl = (4+2+3)/3.
    val docs = Seq(
      (1L, "cat dog cat mouse"),
      (2L, "dog mouse"),
      (3L, "cat fish fish")).toDF("doc_id", "text")
    val qs = Seq((0L, "cat")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "query_text", k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    def score(tf: Double, dl: Double): Double = {
      val n = 3.0; val df = 2.0; val avgdl = 3.0
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc1: tf=2, dl=4; doc3: tf=1, dl=3. doc2 has no 'cat' -> absent.
    val expect = Seq((1L, score(2, 4)), (3L, score(1, 3)))
      .sortBy(-_._2).zipWithIndex
      .map { case ((id, s), i) => (id, s, (i + 1).toLong) }
    assert(got.sortBy(_._3).toSeq == expect)
  }

  test("bm25TopK and rrfFuse work with STRING doc and query ids") {
    // the old silent cast-to-long nulled every non-numeric id
    val docs = Seq(("d-one", "cat dog cat mouse"), ("d-two", "dog mouse"),
      ("d-three", "cat fish fish")).toDF("doc_id", "text")
    val qs = Seq(("q-a", "cat")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "query_text", k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(("q-a", "d-one", 1L), ("q-a", "d-three", 2L)))
    val ranking = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
      "query_id", "query_text", k = 10)
    val fused = Retrieval.rrfFuse(Seq("only" -> ranking), "doc_id", k = 2)
      .orderBy("rank").select("doc_id").collect().map(_.getString(0))
    assert(fused.toSeq == Seq("d-one", "d-three"))
  }

  test("bm25TopK: multi-term queries sum per-term contributions; ties break by id") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta"), // identical twin: same score, lower id ranks first
      (3L, "alpha alpha alpha gamma")).toDF("doc_id", "text")
    val qs = Seq((7L, "alpha beta")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "query_text", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).take(2).toSeq == Seq(1L, 2L)) // tie -> id order
    assert(got(0)._2 == got(1)._2)
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("bm25TopK: query terms absent from the corpus contribute nothing") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val qs = Seq((0L, "alpha zzz_unseen")).toDF("query_id", "query_text")
    val both = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
      "query_id", "query_text", k = 5).collect()
    val alphaOnly = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq((0L, "alpha")).toDF("query_id", "query_text"),
      "query_id", "query_text", k = 5).collect()
    assert(both.map(r => (r.getLong(1), r.getDouble(2))).toSet ==
      alphaOnly.map(r => (r.getLong(1), r.getDouble(2))).toSet)
    // only doc 1 matches at all
    assert(both.map(_.getLong(1)).toSet == Set(1L))
  }

  test("bm25TopK: empty docs count toward avgdl; shared terms across queries df once") {
    // avgdl = (2+0+4)/3 = 2 — the EMPTY doc must still contribute its
    // zero length (the stats scan's posexplode_outer row), and 'cat'
    // appearing in both queries must produce ONE df, not two.
    val docs = Seq(
      (1L, "cat dog"),
      (2L, ""),
      (3L, "cat cat fish fish")).toDF("doc_id", "text")
    val qs = Seq((0L, "cat"), (1L, "cat fish")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "query_text", k = 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def score(tf: Double, dl: Double, df: Double): Double = {
      val n = 3.0; val avgdl = 2.0
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((0L, 1L)) == r6(score(1, 2, 2)))
    assert(got((0L, 3L)) == r6(score(2, 4, 2)))
    assert(got((1L, 3L)) == r6(score(2, 4, 2) + score(2, 4, 1)))
    assert(got((1L, 1L)) == r6(score(1, 2, 2)))
    assert(!got.contains((0L, 2L)) && !got.contains((1L, 2L)))
  }

  test("rrfFuse: hand-computed fusion, missing-in-one-ranking docs still score") {
    val lex = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 20L, 1L), (0L, 40L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(("bm25", lex), ("dense", dense)),
        "doc_id", k = 4, rrfK = 60)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20: in both (rank 2 lex + rank 1 dense) — must fuse on top.
    val want = Seq(
      (20L, r6(1.0 / 62 + 1.0 / 61), 1L),
      (10L, r6(1.0 / 61), 2L),
      (40L, r6(1.0 / 62), 3L),
      (30L, r6(1.0 / 63), 4L))
    assert(got.toSeq == want)
  }

  test("rrfFuse: score ties break by ascending doc id") {
    val a = Seq((0L, 5L, 1L), (0L, 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 3L, 1L), (0L, 5L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(("x", a), ("y", b)), "doc_id", k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    // both docs score 1/61 + 1/62 — tie, id order wins
    assert(got.toSeq == Seq((3L, 1L), (5L, 2L)))
  }

  // Naive Scala MMR with the operator's exact rounding discipline, for the
  // differential tests below.
  private def naiveMmr(
      corpus: Seq[(Long, Seq[Float])], query: Seq[Float],
      k: Int, m: Int, lam: Double): Seq[(Long, Double, Double)] = {
    def unit(v: Seq[Float]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      if (n > 0) v.map(_.toDouble / n) else v.map(_ => 0.0)
    }
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val uq = unit(query)
    val cands = corpus.map { case (id, v) => (id, r6(dot(unit(v), uq)), unit(v)) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(m)
    val picked = scala.collection.mutable.Buffer[(Long, Double, Double, Seq[Double])]()
    (1 to k).foreach { _ =>
      val remaining = cands.filterNot(c => picked.exists(_._1 == c._1))
      if (remaining.nonEmpty) {
        val best = remaining.map { case (id, rel, uv) =>
          val maxSim = picked.map(s => r6(dot(uv, s._4)))
            .maxOption.getOrElse(0.0)
          (r6(lam * rel - (1.0 - lam) * maxSim), id, rel, uv)
        }.minBy { case (score, id, _, _) => (-score, id) }
        picked += ((best._2, best._3, best._1, best._4))
      }
    }
    picked.toSeq.map { case (id, rel, score, _) => (id, rel, score) }
  }

  test("mmrRerank matches a naive greedy reimplementation and diversifies") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.0f, 0.0f)), // collinear copy of 0 — relevance rank 2 by id tie
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.1f, 0.9f, 0.1f)),
      (4L, Seq(0.5f, 0.5f, 0.2f)),
      (5L, Seq(0.2f, 0.1f, 0.9f)))
    val query = Seq(1.0f, 0.2f, 0.1f)
    val vecs = corpus.toDF("vec_id", "embedding")
    val qs = Seq((100L, query)).toDF("vec_id", "embedding")
    val got = Retrieval.mmrRerank(vecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 3, m = 6, lambda = 0.5)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val want = naiveMmr(corpus, query, k = 3, m = 6, lam = 0.5)
    assert(got.toSeq == want)
    // the near-copy (id 1) is relevance rank 2 but must NOT be MMR rank 2
    val byRel = corpus.map { case (id, v) =>
      val uq = query.map(_.toDouble); val uv = v.map(_.toDouble)
      (id, uv.zip(uq).map { case (x, y) => x * y }.sum /
        (math.sqrt(uv.map(x => x * x).sum) * math.sqrt(uq.map(x => x * x).sum)))
    }.sortBy(c => (-c._2, c._1)).map(_._1)
    assert(byRel(1) == 1L)
    assert(got(1)._1 != 1L)
    assert(got.map(_._1).contains(0L)) // top relevance always survives
  }

  test("mmrRerank: fewer candidates than k stops cleanly, no null rows") {
    val vecs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((9L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Retrieval.mmrRerank(vecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 4, m = 4, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(got.length == 2)
    assert(got.forall(r => !r.isNullAt(1) && !r.isNullAt(3)))
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 2L))
  }

  test("ndcgReport: hand-computed leave-one-in nDCG") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.8f, 0.2f), 0),
      (4L, Seq(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Retrieval.ndcgReport(corpus, "vec_id", "embedding", "label",
        corpus.filter(col("vec_id") === 1), "vec_id", "embedding", k = 3)
      .collect().head
    // Ranking for query 1 (label 0) after self-exclusion:
    // 2 (gain 0), 3 (gain 1), 4 (gain 1); n_rel = 2.
    val l2 = (x: Double) => math.log(x) / math.log(2)
    val dcg = 1.0 / l2(3.0) + 1.0 / l2(4.0)
    val idcg = 1.0 / l2(2.0) + 1.0 / l2(3.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 1L)
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L)
    assert(got.getDouble(3) == r6(dcg))
    assert(got.getDouble(4) == r6(idcg))
    assert(got.getDouble(5) == r6(dcg / idcg))
  }

  test("ndcgReport: perfect retrieval scores 1.0; lonely label scores NULL") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.95f, 0.05f), 0),
      (3L, Seq(0.0f, 1.0f), 7),
      (4L, Seq(0.1f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Retrieval.ndcgReport(corpus, "vec_id", "embedding", "label",
        corpus.filter(col("vec_id").isin(1L, 3L)), "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(5))))).toMap
    assert(got(1L) == ((1L, 1L, Some(1.0)))) // nearest neighbor shares label 0
    assert(got(3L) == ((0L, 0L, None)))      // label 7 has no other member
  }

  test("bm25TopK fails loud past the query-row and query-vocab caps") {
    val docs = (0L until 40L).map(i => (i, s"term$i filler"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.maxBroadcastQueries", "5")
    try {
      val err = intercept[IllegalArgumentException] {
        Retrieval.bm25TopK(docs, "doc_id", "text", docs, "doc_id", "text",
          k = 2)
      }
      assert(err.getMessage.contains("maxBroadcastQueries") &&
        err.getMessage.contains("bm25TopK"))
    } finally spark.conf.unset("spark.graft.maxBroadcastQueries")
    // vocab cap: few query ROWS, huge combined vocabulary
    val fatQs = Seq((1L, (0 until 300).map(j => s"w$j").mkString(" ")))
      .toDF("qid", "qtext")
    spark.conf.set("spark.graft.maxQueryVocab", "100")
    try {
      val err = intercept[IllegalArgumentException] {
        Retrieval.bm25TopK(docs, "doc_id", "text", fatQs, "qid", "qtext",
          k = 2)
      }
      assert(err.getMessage.contains("maxQueryVocab"))
    } finally spark.conf.unset("spark.graft.maxQueryVocab")
  }
}
