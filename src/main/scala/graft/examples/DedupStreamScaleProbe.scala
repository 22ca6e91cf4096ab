package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scale probe for the streaming MinHash near-dedup's bucketed state
  * (q81's operator): a large corpus is bulk-ingested as the first
  * micro-batch, then a sequence of small "trickle" batches arrives — the
  * steady-state regime of an incremental crawl — and we record every
  * micro-batch's trigger duration from the StreamingQueryListener.
  *
  * The experiment runs twice over identical data and batch boundaries:
  *   - nStateBuckets = 1  — every probe reads the WHOLE accumulated
  *     state (the flat-layout behavior this round replaced);
  *   - nStateBuckets = 64 — the shipped layout: the verifier reads only
  *     the shingle buckets holding actual candidate ids, and the band
  *     probe prunes to touched band buckets.
  *
  * Measured (local[16], 20k-doc trickle batches; steady-state = LAST
  * trickle batch's trigger seconds — early trickle batches carry JIT/
  * codegen warmup, so the mean overstates both configs):
  *
  *   accumulated state   flat (nb=1)   bucketed (nb=64)
  *   1.0M docs           4.85          3.80
  *   2.0M docs           6.73          3.79
  *
  * The flat layout's per-batch cost grows linearly with accumulated
  * state (it re-reads the whole shingle store to verify each batch's
  * candidates); the bucketed layout is FLAT — its cost is the batch's
  * own shingle/sign/band work plus a candidate-bucket read that follows
  * the batch's candidate count, not the corpus. Band-bucket pruning
  * additionally engages when a batch's distinct (band, band_sig) keys
  * are fewer than the bucket count (the true trickle regime;
  * spec-tested for exactness at any batch size). Size `nStateBuckets`
  * to the deployment: candidate-bucket pruning needs buckets ≫ the
  * per-batch candidate count, while each append writes one file per
  * touched bucket — at this probe's size 64 is the sweet spot; a
  * 10⁹-doc corpus with million-row batches wants thousands.
  *
  * Near-dup structure: ~0.05% of trickle docs reuse the word-seed of a bulk
  * doc (jaccard ≈ 0.9 against it), the rest are unique — candidate sets
  * stay small and cross-batch, like a real crawl increment.
  */
object DedupStreamScaleProbe {

  def main(args: Array[String]): Unit = {
    val bulk = args.headOption.map(_.toInt).getOrElse(1000000)
    val trickle = args.lift(1).map(_.toInt).getOrElse(20000)
    val nTrickle = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Word-salad text from a per-doc seed: 25 seed-determined words + 3
    // doc-unique words => same-seed docs sit at jaccard ~0.9, different
    // seeds at ~0. Every 1997th trickle doc reuses a bulk doc's seed.
    def text(seedCol: org.apache.spark.sql.Column) = array_join(
      concat(
        transform(sequence(lit(1), lit(25)),
          j => conv(pmod(xxhash64(seedCol, j), lit(1679616L)), 10, 36)),
        transform(sequence(lit(1), lit(3)),
          j => conv(pmod(xxhash64(col("id"), j + 100), lit(1679616L)), 10, 36))),
      " ")
    def docsRange(from: Long, until: Long) = spark.range(from, until)
      .select(col("id").as("doc_id"),
        text(when(col("id") >= bulk && col("id") % 1997 === 0,
          col("id") % (bulk / 2)).otherwise(col("id"))).as("text"))

    val total = bulk.toLong + trickle.toLong * nTrickle
    for (nb <- Seq(1, 64)) {
      val base = java.nio.file.Files.createTempDirectory("graft-dsprobe").toString
      val srcDir = s"$base/docs"
      // one file per intended micro-batch, written in arrival order
      // (FileStreamSource takes files in modification-time order)
      docsRange(0L, bulk.toLong).coalesce(4)
        .write.mode("append").parquet(srcDir)
      Thread.sleep(50)
      for (b <- 0 until nTrickle) {
        val from = bulk.toLong + b.toLong * trickle
        docsRange(from, from + trickle).coalesce(1)
          .write.mode("append").parquet(srcDir)
        Thread.sleep(50)
      }
      val durations = collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0)
            durations.synchronized {
              durations += ((e.progress.batchId,
                e.progress.durationMs.get("triggerExecution").toDouble / 1000))
            }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.streamingMinHashNearDuplicates(
        spark, srcDir, "*.parquet", "doc_id", "text",
        stateDir = s"$base/state", checkpointDir = s"$base/ckpt",
        threshold = 0.7, maxFilesPerTrigger = 1, nStateBuckets = nb)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // progress events are delivered async on the listener bus — let it
      // drain before reading, or the last batches' stats go missing
      Thread.sleep(2000)
      spark.streams.removeListener(listener)
      val byBatch = durations.sortBy(_._1)
      val trickleDurs = byBatch.drop(4).map(_._2) // bulk = 4 files = 4 batches
      println(f"PROBE nStateBuckets=$nb docs=$total pairs=$nPairs wall=$wall%.1f s")
      println("PROBE per-batch trigger seconds (bulk first): " +
        byBatch.map { case (id, d) => f"b$id=$d%.2f" }.mkString(" "))
      if (trickleDurs.nonEmpty)
        println(f"PROBE trickle batches: first=${trickleDurs.head}%.2f " +
          f"last=${trickleDurs.last}%.2f " +
          f"mean=${trickleDurs.sum / trickleDurs.size}%.2f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
