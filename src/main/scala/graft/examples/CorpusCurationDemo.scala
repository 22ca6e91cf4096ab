package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation over the documents table: quality
  * scoring → repetition gate → boilerplate strip → PII scrub → near-dup
  * pairs → duplicate clusters → keep list → benchmark decontamination →
  * stratified mixing → token accounting → sequence packing. Every step is
  * an oracle-gated operator (q10-q18, q50-q60); this demo shows them
  * composing into the pipeline a data-curation team would actually run.
  */
object CorpusCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.ops.{Curation, Dedup, Sampling}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} docs")

    // 1. Quality gate: langid + heuristic quality score + repetition cut
    //    (drop documents dominated by one repeated bigram).
    val rep = Curation.repetitionReport(docs, "doc_id", "text", separator = " ")
      .select(col("doc_id"), col("top_bigram_frac"))
    val scored = docs.join(rep, "doc_id").select(
      col("doc_id"), col("lang"), col("source"), col("text"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      col("top_bigram_frac"))
    // Stage results are persisted: each stage feeds both the next stage and
    // a progress count, and the later stages (cluster dedup) iterate.
    val kept1 = scored.filter(col("quality") >= 0.5 && col("top_bigram_frac") < 0.9)
      .persist()
    println(s"after quality+repetition gate: ${kept1.count()}")

    // 2. Boilerplate strip + PII scrub (text rewrite steps compose before
    //    dedup so shared boilerplate can't glue unrelated docs together).
    val stripped = Curation.stripBoilerplate(kept1, "doc_id", "text",
        separator = " ", minDocs = docs.count() * 9 / 10)
      .withColumn("text", Curation.redactPii(col("text_clean")))
      .drop("text_clean")
      .join(kept1.drop("text"), "doc_id")
      .persist()
    println(s"after boilerplate strip + pii scrub: ${stripped.count()}")

    // 3. Near-dup removal at cluster level (MinHash+LSH pairs → connected
    //    components → keep each cluster's minimum).
    val pairs = Dedup.minHashNearDuplicates(stripped, "doc_id", "text",
      threshold = 0.5, numHashes = 8, bands = 4, shingleLen = 3)
    val clusters = Dedup.duplicateClusters(pairs)
    val deduped = Dedup.keepList(stripped, "doc_id", clusters).persist()
    println(s"near-dup pairs: ${pairs.count()}, clusters drop " +
      s"${stripped.count() - deduped.count()} docs -> ${deduped.count()}")

    // 4. Benchmark decontamination: drop training docs colliding with the
    //    held-out eval set (here: doc_id < 25 stands in for the benchmark).
    val decon = Curation.decontaminate(
      deduped.filter(col("doc_id") >= 25), "doc_id", "text",
      docs.filter(col("doc_id") < 25), "text", n = 6).persist()
    println(s"after decontamination: ${decon.count()}")

    // 5. Mixture: down-sample dominant strata, up-weight scarce ones.
    val mixed = Sampling.weightedRepeat(
      Sampling.stratifiedHashSample(decon, "doc_id", "lang",
        Seq("en" -> 0.5)),
      "lang", Seq("de" -> 2)).persist()
    println("mixture by lang (rows after sample+repeat):")
    mixed.groupBy("lang").count().orderBy("lang").show()

    // 6. Token accounting, then pack into fixed-length training sequences
    //    per source shard.
    mixed.agg(
      sum(TextFunctions.tokenCount(col("text"))).as("whitespace_tokens"),
      sum(TextFunctions.bpeTokenCountEstimate(col("text"))).as("bpe_tokens_est"))
      .show()
    val packed = Curation.packSequences(
      mixed.filter(col("copy") === 1), "doc_id",
      TextFunctions.tokenCount(col("text")), "source", seqLen = 512)
    println(s"packed rows: ${packed.count()}, sequences: " +
      packed.select("source", "seq_id").distinct().count())

    spark.stop()
  }
}
