package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the curation operators beyond the sf0.1 test data: a
  * deterministic synthetic document corpus (words derived from the row id —
  * no RNG, runs comparable) at 20×–80× the sf0.1 row count. Prints
  * per-operator wall times; PLANS.md cites a run.
  *
  * Usage: sbt "runMain graft.examples.CurationScaleProbe [nDocs] [wordsPerDoc]"
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val wpd = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.ops.{Curation, Dedup, Sampling}

    // Hash-derived base-36 words (deterministic, no RNG). Two properties a
    // linear-congruential pattern lacks, both needed for honest probes:
    // character n-gram diversity comparable to natural text (the digit-only
    // variant concentrated dfs mid-range — the worst case for the inverted
    // gram index, which natural zipfian text never exhibits), and no
    // degenerate shingle collisions that would quadratically blow up LSH
    // buckets with pairs no real corpus has. Every 100th doc duplicates its
    // predecessor, so the dedup paths see a realistic ~1% dup rate.
    // ~6 bytes/word ⇒ ~300 B/doc at the default 50 words.
    val contentId = when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        (col("id") % 64).cast("string").as("source"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => conv(pmod(xxhash64(contentId * lit(1000003L) + i),
            lit(60466176L)).cast("string"), 10, 36)), " ")
          .as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    docs.count()
    println(s"corpus: $n docs x $wpd words")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // Operators persist intermediates (gram indexes, signature frames)
      // and rely on callers to clear between independent queries (the
      // Bench discipline); without this, earlier blocks' caches evict the
      // corpus and inflate later blocks.
      spark.catalog.clearCache()
      docs.persist(); docs.count()
      r
    }

    timed("exact dedup groups (md5 shuffle)") {
      Dedup.exactGroups(docs, "doc_id", "text").count()
    }
    timed("minhash signatures (row-level expression)") {
      Dedup.minHashSignatures(docs, "doc_id", "text").count()
    }
    timed("minhash near-dup pairs (banded LSH buckets + in-bucket verify)") {
      Dedup.minHashNearDuplicates(docs, "doc_id", "text",
        threshold = 0.8, numHashes = 16, bands = 4, shingleLen = 3).count()
    }
    timed("ngram jaccard pairs (df-pruned inverted index self-join)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 8, threshold = 0.8, maxDocFreq = 100).count()
    }
    timed("ngram jaccard pairs, gramFraction=0.25 (hash-sampled index)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 8, threshold = 0.8, maxDocFreq = 100, gramFraction = 0.25).count()
    }
    timed("contamination vs 1k-doc benchmark (row-local GramMatchStats)") {
      Curation.contaminationReport(
        docs.filter(col("doc_id") >= 1000), "doc_id", "text",
        docs.filter(col("doc_id") < 1000), "text", n = 6)
        .filter(col("contaminated")).count()
    }
    timed("boilerplate strip (fp df count + row-local excision)") {
      Curation.stripBoilerplate(docs, "doc_id", "text",
        separator = " ", minDocs = n.toLong / 10).count()
    }
    timed("repetition signals (one codegen row pass, no shuffle)") {
      Curation.repetitionReport(docs, "doc_id", "text", separator = " ").count()
    }
    timed("pii redaction (codegen regex chain, no shuffle)") {
      docs.select(Curation.redactPii(col("text"))).count()
    }
    timed("sequence packing (64 shards, per-shard windows)") {
      Curation.packSequences(docs, "doc_id",
        TextFunctions.tokenCount(col("text")), "source", seqLen = 2048).count()
    }
    timed("in-doc segment dedup (per-row rewrite, no shuffle)") {
      Curation.dedupeSegments(docs, "doc_id", "text", separator = " ").count()
    }
    timed("vocabulary top-100 (hash agg + TakeOrderedAndProject)") {
      Curation.vocabulary(docs, "text", k = 100).count()
    }
    timed("chunking 32/24 (scan-stage generator, no shuffle)") {
      Curation.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 32, stride = 24).count()
    }
    timed("cross-corpus near-dedup (odd crawl banded vs even corpus)") {
      Dedup.crossCorpusNearDuplicates(
        docs.filter(col("doc_id") % 2 === 1), "doc_id",
        docs.filter(col("doc_id") % 2 === 0), "doc_id",
        "text", threshold = 0.8, numHashes = 16, bands = 4).count()
    }
    timed("per-group top-10 (bounded CollectTopK, 64 groups)") {
      Sampling.topPerGroup(
        docs.withColumn("score", length(col("text")).cast("double")),
        "doc_id", "source", "score", k = 10).count()
    }
    timed("outlier report (median/MAD broadcast-back)") {
      Curation.outlierReport(docs, "doc_id", "source",
        length(col("text")), "n_chars").count()
    }
    timed("char-bigram entropy (per-doc alphabet-bounded state)") {
      Curation.charEntropyReport(docs, "doc_id", "text").count()
    }
    timed("bpe pair counts (generator explodes + hash agg + top-k)") {
      Curation.bpePairCounts(docs, "text", k = 100).count()
    }
    // The composed chain is timed with and without the stage barrier:
    // decontaminate branches its input (gram index + anti-join), so
    // without a persist on the deduped stage the strip->dedup subtree
    // recomputes once per branch. The persist is the in-memory form of
    // what a production curation pipeline does between stages (write the
    // stage table).
    def composedChain(barrier: Boolean): Unit = {
      val stripped = Curation.stripBoilerplate(docs, "doc_id", "text",
        separator = " ", minDocs = n.toLong / 10)
      val dedupedRaw = Dedup.exactDedup(stripped, "doc_id", "text_clean")
      val deduped = if (barrier) dedupedRaw.persist() else dedupedRaw
      val clean = Curation.decontaminate(
        deduped.filter(col("doc_id") >= 1000), "doc_id", "text_clean",
        docs.filter(col("doc_id") < 1000), "text", n = 6)
      Curation.packSequences(
        clean.join(docs.select("doc_id", "source"), "doc_id"), "doc_id",
        TextFunctions.tokenCount(col("text_clean")), "source", seqLen = 2048).count()
      if (barrier) deduped.unpersist()
    }
    timed("composed chain: strip -> exact dedup -> decontaminate -> pack (q63 shape)") {
      composedChain(barrier = true)
    }
    timed("composed chain WITHOUT the stage barrier (recompute cost)") {
      composedChain(barrier = false)
    }
    spark.stop()
  }
}
