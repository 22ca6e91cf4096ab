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
}
