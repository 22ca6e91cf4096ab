package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 operators (URL canonicalization / host
  * stats / host capping and the unigram-LM tokenizer) beyond the sf0.1
  * test data: deterministic synthetic URLs + hash-derived word corpus
  * (no RNG — runs comparable), zipf-skewed hosts so the capping and
  * report paths see the hot-host shape they exist for. Prints
  * per-operator wall times; PLANS.md cites a run.
  *
  * Usage: sbt "runMain graft.examples.WebTokenizerScaleProbe [nDocs] [wordsPerDoc]"
  */
object WebTokenizerScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val wpd = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{UnigramLm, Web}

    // Zipf-ish host popularity: host k gets ~n/(k+1)^2 of the URLs (the
    // hottest host owns ~60% — the shape host capping exists for); messy
    // forms rotate per row so every canonicalization rule fires.
    val hostId = floor(lit(1.0) /
      sqrt(pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1e6
        + lit(1e-6))).cast("long")
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        concat(lit("h"), hostId).as("h"),
        // Zipf-ish words (rank ~ 1/sqrt(u), vocab capped at ~200k ranks,
        // base-36 rendered => 1-4 char words): natural-text frequency
        // shape, so the distinct-word table the trainer iterates over is
        // zipf-bounded the way a real corpus's is — NOT near-unique
        // hashes, which would model DNA, not prose.
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => conv(least(
            floor(lit(1.0) / sqrt(
              (pmod(xxhash64(col("id") * lit(1000003L) + i),
                lit(1000000L)).cast("double") + lit(1.0)) / 1e6))
              .cast("long"),
            lit(200000L)).cast("string"), 10, 36)), " ").as("text"))
      .withColumn("url", expr(
        """CASE cast(doc_id % 4 AS int)
           WHEN 0 THEN concat('HTTP://WWW.', h, '.Example.COM:80/a/',
             cast(doc_id AS string), '/?utm_source=x&b=2&a=1#f')
           WHEN 1 THEN concat('https://u@', h, '.example.com:443/b/',
             cast(doc_id AS string))
           WHEN 2 THEN concat('https://', h, '.example.com/c///?gclid=',
             cast(doc_id AS string))
           ELSE concat('  https://', h, '.example.com./d?fbclid=1&q=',
             cast(doc_id AS string), '  ')
           END"""))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    docs.count()
    println(s"corpus: $n docs x $wpd words, zipf hosts")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      docs.persist(); docs.count()
      r
    }

    timed("canonicalizeUrl (scan projection, count non-null)") {
      docs.select(Web.canonicalizeUrl(col("url")).as("c"))
        .filter(col("c").isNotNull).count()
    }
    timed("hostReport (distinct-page aggregate)") {
      Web.hostReport(docs, "url").count()
    }
    timed("hostCapSample cap=1000 (bounded top-k per host)") {
      Web.hostCapSample(docs, "url", "doc_id", 1000).count()
    }
    timed("unigram wordFrequencies (the one corpus pass)") {
      UnigramLm.wordFrequencies(docs, "text", 30).count()
    }
    timed("unigram train (seed + 2 EM rounds over the word table)") {
      UnigramLm.train(docs, "text", vocabSize = 2000, maxPieceLen = 4,
        emIters = 2).count()
    }
    timed("pageRank 3 iters (zipf host graph, ~n edges)") {
      // Directed edges between zipf-popular hosts (re-derives the same
      // skew as the URL hosts): the hot node owns ~60% of endpoints.
      val zipfNode = (c: org.apache.spark.sql.Column) =>
        concat(lit("g"), floor(lit(1.0) / sqrt(
          (pmod(xxhash64(c), lit(1000000L)).cast("double") + lit(1.0)) / 1e6))
          .cast("long"))
      val edges = spark.range(n.toLong).select(
        zipfNode(col("id")).as("src"),
        zipfNode(col("id") * lit(31L) + lit(7L)).as("dst"))
      graft.ops.Graphs.pageRank(edges, "src", "dst", iters = 3).count()
    }

    val vocab = UnigramLm.train(docs, "text", vocabSize = 2000,
      maxPieceLen = 4, emIters = 2)
    timed("unigram fertilityReport (encode pass only, trained vocab)") {
      UnigramLm.fertilityReport(
        docs.withColumn("lang", lit("xx")), "doc_id", "text", "lang",
        length(col("text")), vocab, maxPieceLen = 4, maxWordLen = 30)
        .count()
    }
    spark.stop()
  }
}
