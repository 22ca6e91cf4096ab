package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.TextFunctions.{tokenCount, tokens}

/** Keyword retrieval over a document corpus — the sparse (lexical) half of
  * a retrieval stack next to [[Similarity]]'s dense half. BM25 is the
  * scoring function every production keyword index (Lucene, Elasticsearch,
  * Tantivy) defaults to; here it is one declarative plan over the corpus,
  * so it runs where the data already lives instead of round-tripping
  * through an external search cluster.
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * Scoring follows the Lucene form: for each query term t present in
    * doc d, `idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`
    * with `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))` (never negative),
    * summed over the query's DISTINCT terms. Ties in the final ranking
    * break by ascending doc id on the 6-dp-rounded score, so the ranking
    * is reproducible across engines.
    *
    * Scale shape: the corpus tokenizes once into per-(doc, term)
    * frequencies, carrying the doc length through the aggregate (no
    * second corpus join). Document frequencies are computed ONLY for the
    * query terms — the (term, df) table is query-vocabulary-sized, built
    * by semi-joining the corpus term table against the broadcast query
    * terms, so the full corpus vocabulary is never materialized. The
    * scoring join broadcasts the (query, term, idf) table; the corpus side
    * never shuffles on the skewed term key. Per-(query, doc) partial
    * scores fold over the term-sorted list (float sums add in identical
    * order on any engine and partitioning), and the per-query top-k is the
    * O(k)-state bounded `CollectTopK` aggregate — executor memory is
    * O(k × queries) at any corpus size.
    *
    * Returns (query_id, idCol, score, rank ≤ k).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // (doc, term, tf, dl): dl rides the tokenize pass through the
    // aggregate — max() over a per-doc constant.
    val terms = docs
      .select(col(idCol), tokenCount(col(textCol)).as("__dl"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(tokenCount(col(textCol))).cast("double") /
        count(lit(1)).cast("double")).as("__avgdl"))
    val qterms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(tokens(col(qTextCol)))).as("__t"))
    // df only for the query vocabulary: semi-join against the broadcast
    // query terms BEFORE the df aggregate.
    val dfreq = terms
      .join(broadcast(qterms.select("__t").distinct()), Seq("__t"), "left_semi")
      .groupBy("__t").agg(count(lit(1)).cast("double").as("__df"))
    val qidf = qterms.join(dfreq, Seq("__t"), "inner")
      .crossJoin(stats)
      .select(col("query_id"), col("__t"),
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
          .as("__idf"),
        col("__avgdl"))
    val contrib = terms.join(broadcast(qidf), Seq("__t"))
      .select(col("query_id"), col(idCol), col("__t"),
        (col("__idf") * (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1.0) - b +
            lit(b) * col("__dl").cast("double") / col("__avgdl"))))
          .as("__s"))
    // Fold the per-term contributions over the term-sorted list: the float
    // sum adds identical terms in identical order on any engine/partition
    // layout (the q86 portability pattern). Matched-term lists are bounded
    // by the query length.
    val scored = contrib
      .groupBy(col("query_id"), col(idCol))
      .agg(sort_array(collect_list(struct(col("__t"), col("__s")))).as("__ts"))
      .select(col("query_id"), col(idCol),
        round(aggregate(col("__ts"), lit(0.0),
          (acc, x) => acc + x.getField("__s")), 6).as("score"))
    val item = struct((-col("score")).as("negscore"),
      col(idCol).cast("long").as("did"))
    scored.groupBy("query_id")
      .agg(array_sort(ColumnBridge.collectTopK(item, k, reverse = true))
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__i", "__x")))
      .select(col("query_id"), col("__x.did").as(idCol),
        (-col("__x.negscore")).as("score"),
        (col("__i") + 1).cast("long").as("rank"))
  }
}
