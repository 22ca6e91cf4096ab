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
    import graft.ops.{Curation, Dedup}

    // ~1000-word vocabulary, word sequence a deterministic function of the
    // doc id; ~6 bytes/word ⇒ ~300 B/doc at the default 50 words.
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        (col("id") % 64).cast("string").as("source"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => concat(lit("w"), pmod(col("id") * i + i * i, lit(997)))), " ")
          .as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    docs.count()
    println(s"corpus: $n docs x $wpd words")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("exact dedup groups (md5 shuffle)") {
      Dedup.exactGroups(docs, "doc_id", "text").count()
    }
    timed("minhash signatures (row-level expression)") {
      Dedup.minHashSignatures(docs, "doc_id", "text").count()
    }
    timed("contamination vs 1k-doc benchmark (broadcast semi-join)") {
      Curation.contaminationReport(
        docs.filter(col("doc_id") >= 1000), "doc_id", "text",
        docs.filter(col("doc_id") < 1000), "text", n = 6)
        .filter(col("contaminated")).count()
    }
    timed("boilerplate strip (df count + broadcast anti-join + reassembly)") {
      Curation.stripBoilerplate(docs, "doc_id", "text",
        separator = " ", minDocs = n.toLong / 10).count()
    }
    timed("repetition signals (two hash aggs over exploded grams)") {
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
    spark.stop()
  }
}
