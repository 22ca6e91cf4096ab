package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation over the documents table: quality
  * scoring → near-dup pairs → duplicate clusters → keep list → stratified
  * mixing → token accounting. Every step is an oracle-gated operator
  * (q10-q18, q50-q54); this demo shows them composing into the pipeline a
  * data-curation team would actually run.
  */
object CorpusCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.ops.{Dedup, Sampling}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} docs")

    // 1. Quality gate: langid + heuristic quality score.
    val scored = docs.select(col("doc_id"), col("lang"), col("text"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val kept1 = scored.filter(col("quality") >= 0.5)
    println(s"after quality gate: ${kept1.count()}")

    // 2. Near-dup removal at cluster level (MinHash+LSH pairs → connected
    //    components → keep each cluster's minimum).
    val pairs = Dedup.minHashNearDuplicates(kept1, "doc_id", "text",
      threshold = 0.5, numHashes = 8, bands = 4, shingleLen = 3)
    val clusters = Dedup.duplicateClusters(pairs)
    val deduped = Dedup.keepList(kept1, "doc_id", clusters)
    println(s"near-dup pairs: ${pairs.count()}, clusters drop " +
      s"${kept1.count() - deduped.count()} docs -> ${deduped.count()}")

    // 3. Mixture: down-sample dominant strata, up-weight scarce ones.
    val mixed = Sampling.weightedRepeat(
      Sampling.stratifiedHashSample(deduped, "doc_id", "lang",
        Seq("en" -> 0.5)),
      "lang", Seq("de" -> 2))
    println("mixture by lang (rows after sample+repeat):")
    mixed.groupBy("lang").count().orderBy("lang").show()

    // 4. Token accounting for the final mix.
    mixed.agg(
      sum(TextFunctions.tokenCount(col("text"))).as("whitespace_tokens"),
      sum(TextFunctions.bpeTokenCountEstimate(col("text"))).as("bpe_tokens_est"))
      .show()

    spark.stop()
  }
}
