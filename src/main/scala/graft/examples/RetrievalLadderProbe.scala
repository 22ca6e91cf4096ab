package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale ladder for the retrieval family (BM25 / hybrid RRF / MMR /
  * nDCG) — the last operator family with oracle + differential coverage
  * but no beyond-the-bench scale evidence (VERDICT r15 #1). Same
  * methodology as [[EventLadderProbe]]: geometric 2M/4M/8M rungs, per-op
  * wall AND shuffle-bytes deltas, full-column checksums to force
  * evaluation (count() alone is optimizer-eliminable on join-shaped
  * reports), and a uniform-term control at the top rung to separate skew
  * cost from volume cost.
  *
  * Skew design: document tokens draw zipf-style — u hash-uniform in
  * [0,1), word = floor(V · u³) — so the hottest word appears in ~70% of
  * documents at any scale (P(w0) = V^(−1/3) ≈ 2.7% of tokens at
  * V = 50k). The queries deliberately include those hot terms: BM25's
  * claimed scale property is that the corpus NEVER shuffles on the term
  * key (the (query,term,idf) table broadcasts), so a 70%-selectivity
  * term must cost linear scan work, not a hot-key straggler. The
  * (doc, term) tf aggregate and the (query, doc) score fold both carry
  * fine-grained keys immune to term skew — the ladder verifies bytes
  * stay ≤ 2.0×/rung under exactly the skew that would break a
  * term-keyed shuffle.
  *
  * Usage: sbt "runMain graft.examples.RetrievalLadderProbe [sizesCsv]"
  * default rungs: 2000000,4000000,8000000 documents.
  */
object RetrievalLadderProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2000000, 4000000, 8000000))
    val vocab = 50000L
    val dim = 16
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Retrieval, Similarity}
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    // sum in decimal: 64-bit hash sums overflow Long under ANSI mode
    def checksum(df: DataFrame): Long = {
      val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      h.agg(count(lit(1)).as("n"), sum(col("h").cast("decimal(38,0)")))
        .collect()(0).getLong(0)
    }
    def staged(label: String)(body: => Long): Unit = {
      Thread.sleep(300); shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"  $label%-22s ${wall}%7.2f s  shuffle=${shuffleBytes.get / 1e6}%9.1f MB  rows=$rows")
    }

    // zipf-ish word draw: u uniform from hash, u^3 concentrates on low
    // word ids (w0 ≈ 2.7% of tokens at V=50k → in ~70% of 45-token docs)
    def zipfWord(seed: Column): Column = {
      val u = pmod(xxhash64(seed * lit(2654435761L)), lit(1000000L))
        .cast("double") / lit(1000000.0)
      concat(lit("w"), floor(lit(vocab.toDouble) * u * u * u).cast("long"))
    }
    def uniformWord(seed: Column): Column =
      concat(lit("w"), pmod(xxhash64(seed * lit(2654435761L)), lit(vocab)))

    // 30–60 token documents assembled from the word draw; ids spread so
    // token (d, i) and (d+1, i−k) never collide on a seed
    def docs(n: Long, word: Column => Column): DataFrame =
      spark.range(n).select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(
            sequence(lit(0L), lit(29L) + pmod(xxhash64(col("id")), lit(31L))),
            i => word(col("id") * lit(64L) + i))).as("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()

    // unit-ish embedding: deterministic hash-valued components; label
    // cardinality 100 for the nDCG relevance pools
    def embs(n: Long): DataFrame =
      spark.range(n).select(
          col("id").as("doc_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => pmod(xxhash64(col("id") * lit(31L) + i), lit(2000L))
              .cast("double") / lit(1000.0) - lit(1.0)).as("vec"),
          pmod(col("id"), lit(100L)).as("label"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()

    // 8 queries mixing hot (w0/w1: zipf-hot) and cool terms; ids = 0..7
    val queries = Seq(
      (0L, "w0 w1 w17"), (1L, "w0 w2 w9000"), (2L, "w1 w3 w210 w4800"),
      (3L, "w5 w44 w1300"), (4L, "w0 w1 w2 w3"), (5L, "w7 w880 w23000"),
      (6L, "w12 w300 w9999"), (7L, "w0 w61 w777 w31000"))
      .toDF("query_id", "query_text")

    def qVecs(src: DataFrame): DataFrame = src
      .filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("vec").as("qvec"),
        col("label").as("qlabel"))

    def rungs(tag: String, word: Column => Column, ns: Seq[Int]): Unit =
      for (n <- ns) {
        val d = docs(n.toLong, word); val e = embs(n.toLong)
        d.count(); e.count()
        println(s"== $tag rung n=$n")
        staged("bm25_topk") {
          checksum(Retrieval.bm25TopK(d, "doc_id", "text",
            queries, "query_id", "query_text", 10))
        }
        val qv = qVecs(e)
        staged("hybrid_rrf") {
          // the q121 shape end-to-end: sparse BM25 + dense top-k fused
          val sparse = Retrieval.bm25TopK(d, "doc_id", "text",
            queries, "query_id", "query_text", 20)
          val dense = Similarity.topKJoin(e, "doc_id", "vec",
            qv, "query_id", "qvec", 20)
          checksum(Retrieval.rrfFuse(
            Seq("bm25" -> sparse, "dense" -> dense), "doc_id", 10))
        }
        staged("mmr_rerank") {
          checksum(Retrieval.mmrRerank(e, "doc_id", "vec",
            qv, "query_id", "qvec", 10, 40))
        }
        staged("ndcg_report") {
          checksum(Retrieval.ndcgReport(e, "doc_id", "vec", "label",
            qv.withColumnRenamed("qlabel", "label")
              .select(col("query_id"), col("qvec"), col("label")),
            "query_id", "qvec", 10))
        }
        d.unpersist(); e.unpersist()
      }

    rungs("zipf", zipfWord, sizes)
    // uniform-term control at the top rung: same volume, no hot words —
    // isolates what the term skew itself costs each operator
    rungs("uniform-control", uniformWord, Seq(sizes.max))
    spark.stop()
  }
}
