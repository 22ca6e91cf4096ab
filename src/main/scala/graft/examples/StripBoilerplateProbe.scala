package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the round-13 stripBoilerplate rewrite: broadcast-boiler
  * (per-doc distinct fps row-locally, narrow fp-count shuffle, collected
  * boiler set, row-local codegen strip — zero joins in the output plan)
  * vs the pre-round-13 shuffle plan (shared corpus-scale segment exchange
  * read twice: df count + broadcast-anti-join reassembly).
  *
  * Same deterministic corpus generator as [[CurationScaleProbe]]; min-of-2
  * repeats per arm, arms alternated so neither owns warmer page cache.
  * Run on a QUIET machine — never concurrently with sbt/tests.
  *
  * Usage: sbt "runMain graft.examples.StripBoilerplateProbe [nDocs] [wordsPerDoc]"
  */
object StripBoilerplateProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val wpd = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Curation

    val contentId = when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(wpd)),
          i => conv(pmod(xxhash64(contentId * lit(1000003L) + i),
            lit(60466176L)).cast("string"), 10, 36)), " ")
          .as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    docs.count()
    val minDocs = n.toLong / 10
    println(s"corpus: $n docs x $wpd words, minDocs=$minDocs")

    // Materialize text_clean for real: a bare count() lets Catalyst
    // prune the strip projection (broadcast arm) and eliminate the
    // unique-key reassembly join (shuffle arm) — both arms would measure
    // nothing. The length-sum forces every cleaned byte to exist.
    def sample(body: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val row = body.agg(count(lit(1)), sum(length(col("text_clean")))).head()
      val s = (System.nanoTime() - t0) / 1e9
      require(row.getLong(0) == n,
        s"strip must return every input doc: ${row.getLong(0)} != $n")
      s
    }
    // per-arm shuffle-write bytes (the round-13 lesson: bytes, not keys,
    // predict the single-box cliff); listener delivery is async — drain
    // briefly before reading
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def shuffleDelta(before: Long): Long = {
      Thread.sleep(300); shuffleBytes.get() - before
    }

    // alternate arms, min of 2 each; the broadcast arm also reports its
    // two phases (eager boiler job at construction vs the strip pass) and
    // runs both WITH the cell pre-filter (default) and with it disabled
    // (cells=0) — the round-14 A/B the pre-filter decision rests on.
    var bArm = Double.MaxValue; var bCons = Double.MaxValue; var bSh = 0L
    var nArm = Double.MaxValue; var nCons = Double.MaxValue; var nSh = 0L
    var sArm = Double.MaxValue
    for (_ <- 1 to 2) {
      var sh0 = shuffleBytes.get()
      var t0 = System.nanoTime()
      val b = Curation.stripBoilerplate(docs, "doc_id", "text", " ", minDocs)
      var cons = (System.nanoTime() - t0) / 1e9
      bCons = math.min(bCons, cons)
      val bTot = cons + sample(b)
      if (bTot < bArm) { bArm = bTot; bSh = shuffleDelta(sh0) }
      spark.conf.set("spark.graft.stripPrefilterCells", "0")
      sh0 = shuffleBytes.get()
      t0 = System.nanoTime()
      val n = try Curation.stripBoilerplate(docs, "doc_id", "text", " ", minDocs)
      finally ()
      cons = (System.nanoTime() - t0) / 1e9
      nCons = math.min(nCons, cons)
      val nTot = cons + sample(n)
      if (nTot < nArm) { nArm = nTot; nSh = shuffleDelta(sh0) }
      spark.conf.unset("spark.graft.stripPrefilterCells")
      sArm = math.min(sArm, sample(
        Curation.stripBoilerplateShuffle(
          docs, "doc_id", "text", " ", Left(minDocs))))
    }
    println(f"prefilter ON : boiler job $bCons%.2f s, strip ${bArm - bCons}%.2f s, " +
      f"total $bArm%.2f s, shuffle ${bSh / 1e6}%.0f MB")
    println(f"prefilter OFF: boiler job $nCons%.2f s, strip ${nArm - nCons}%.2f s, " +
      f"total $nArm%.2f s, shuffle ${nSh / 1e6}%.0f MB")
    println(f"broadcast(pref): $bArm%.2f s  broadcast(nopref): $nArm%.2f s  " +
      f"shuffle(anti-join): $sArm%.2f s  pref-speedup ${nArm / bArm}%.2fx  " +
      f"vs-antijoin ${sArm / bArm}%.2fx")

    // equivalence at probe scale: both arms byte-identical (skippable at
    // the top rungs — it re-runs both arms — once proven on lower rungs)
    if (args.lift(2).contains("noeq")) { spark.stop(); return }
    val diff = Curation.stripBoilerplate(docs, "doc_id", "text", " ", minDocs)
      .join(Curation.stripBoilerplateShuffle(
          docs, "doc_id", "text", " ", Left(minDocs))
        .withColumnRenamed("text_clean", "shuf"), "doc_id")
      .filter(col("text_clean") =!= col("shuf")).count()
    println(s"arm divergence rows: $diff")
    require(diff == 0, "broadcast and shuffle arms diverged")
    spark.stop()
  }
}
