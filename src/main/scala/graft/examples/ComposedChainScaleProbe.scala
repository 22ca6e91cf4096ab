package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×-beyond-the-bench probe for the two COMPOSED curation chains (the
  * q63 and q77 oracle shapes): per-stage wall times across a geometric
  * corpus ladder (default 1M → 8M docs, ~1600× the sf0.1 bench corpus),
  * plus the q63 stage-barrier adjudication (persist vs recompute) at the
  * top size. A stage whose time grows faster than the corpus between
  * ladder rungs is super-linear and gets investigated; PLANS.md cites the
  * run.
  *
  * Corpus: the CurationScaleProbe hash-derived base-36 word builder
  * (deterministic, zipf-free but n-gram-diverse; ~1% planted duplicates),
  * with FOUR sources so the q77 token-budget mixture exercises its real
  * weight vector.
  *
  * Usage:
  *   sbt "runMain graft.examples.ComposedChainScaleProbe [sizesCsv] [barrierSize]"
  * defaults: sizes 1000000,2000000,4000000,8000000; barrierSize = max.
  */
object ComposedChainScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000000, 2000000, 4000000, 8000000))
    val barrierSize = args.lift(1).map(_.toInt).getOrElse(sizes.max)
    val wpd = 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.ops.{Curation, Dedup, Sampling}

    // SPARK_GRAFT_VOCAB bounds the word space (default 60466176 ≈ every
    // word unique at these sizes). The default is the ADVERSARIAL case
    // for distinct-keyed aggregates: segment-df keys and per-(doc,
    // bigram) groups grow linearly with the corpus, where natural
    // zipfian text saturates its vocabulary. Run once with the default
    // and once with e.g. 50000 to separate corpus-structure effects from
    // operator scaling.
    val vocab = sys.env.getOrElse("SPARK_GRAFT_VOCAB", "60466176").toLong
    def corpus(n: Int): DataFrame = {
      val contentId = when(pmod(col("id"), lit(100)) === 99, col("id") - 1)
        .otherwise(col("id"))
      spark.range(n.toLong).select(
          col("id").as("doc_id"),
          concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
          array_join(transform(sequence(lit(1), lit(wpd)),
            i => conv(pmod(xxhash64(contentId * lit(1000003L) + i),
              lit(vocab)).cast("string"), 10, 36)), " ")
            .as("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    }

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // Per-stage SHUFFLE BYTES (round-12 lesson: bytes, not keys, predict
    // the single-box page-cache cliff): a listener folds every completed
    // Spark stage's shuffle-write bytes into one counter; each probe
    // stage reports its delta. Listener delivery is async — a short
    // drain sleep before reading the counter keeps the attribution
    // honest (the numbers are MB-scale; a straggler event is noise).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def shuffleDelta[A](body: => A): (A, Long) = {
      Thread.sleep(200)
      val before = shuffleBytes.get()
      val r = body
      Thread.sleep(200)
      (r, shuffleBytes.get() - before)
    }

    // stage -> (size -> seconds); insertion-ordered for the table
    val results = collection.mutable.LinkedHashMap
      .empty[String, collection.mutable.LinkedHashMap[Int, Double]]
    val shuffles = collection.mutable.LinkedHashMap
      .empty[String, collection.mutable.LinkedHashMap[Int, Long]]
    def record(stage: String, n: Int, s: Double, rows: Long,
        shufBytes: Long): Unit = {
      results.getOrElseUpdate(stage,
        collection.mutable.LinkedHashMap.empty) += (n -> s)
      shuffles.getOrElseUpdate(stage,
        collection.mutable.LinkedHashMap.empty) += (n -> shufBytes)
      println(f"  [$n%8d] $stage%-28s ${s}%8.2f s  ($rows rows, " +
        f"shuffle ${shufBytes / 1048576.0}%.0f MB)")
    }

    // Min of `reps` repeats per cell: a single sample let one GC pause /
    // cache-population race / ambient blip masquerade as super-linearity
    // (first run of this probe: growth ratios 0.18–2.89 for stages that
    // are all linear by construction). The min over repeats of a
    // deterministic stage is the uncontended cost estimate — the Bench
    // total_min discipline. A PERSISTED stage unpersists between repeats
    // (else repeat 2 would time its own cache read, not the compute) and
    // stays cached after the last repeat for the next stage's input.
    val reps = 2
    // The frame is BY NAME: round-13 made two operators eager (strip's
    // boiler-df collect, decon's bench-gram collect) — a by-value
    // parameter would run those jobs at argument evaluation, OUTSIDE the
    // clock, under-reporting the stage. Each repeat re-constructs the
    // operator, so construction + materialization are timed together.
    def persistedStage(label: String, n: Int, mk: => DataFrame): DataFrame = {
      var last: DataFrame = null
      val runs = (1 to reps).map { _ =>
        if (last != null) last.unpersist(blocking = true)
        System.gc(); Thread.sleep(50)
        shuffleDelta(timed {
          last = mk
          last.persist(); last.count()
        })
      }
      record(label, n, runs.map(_._1._1).min, runs.head._1._2,
        runs.map(_._2).max)
      last
    }
    def actionStage(label: String, n: Int)(body: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        System.gc(); Thread.sleep(50)
        shuffleDelta(timed(body))
      }
      record(label, n, runs.map(_._1._1).min, runs.head._1._2,
        runs.map(_._2).max)
    }


    // Untimed warmup at a size OFF the ladder: the first measured rung
    // otherwise absorbs all codegen/JIT cost (smoke run: q63.strip 34 s
    // at the first rung vs 11 s at the second-and-larger one).
    {
      val w = corpus(50000)
      w.count()
      val ws = Curation.stripBoilerplate(w, "doc_id", "text",
        separator = " ", minDocs = Right(0.8))
      val wd = Dedup.exactDedup(ws, "doc_id", "text_clean").persist()
      Curation.packSequences(
        Curation.decontaminate(wd.filter(col("doc_id") >= 1000), "doc_id",
          "text_clean", w.filter(col("doc_id") < 1000), "text", n = 6)
          .join(w.select("doc_id", "source"), "doc_id"),
        "doc_id", TextFunctions.tokenCount(col("text_clean")),
        "source", seqLen = 2048).count()
      wd.unpersist()
      val wk = Curation.qualityFilter(w, "doc_id", "text",
          minStopwordRatio = 0.0, maxDupSegmentFrac = 0.95, separator = " ")
        .filter(col("keep"))
        .join(w.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_tokens")
      Curation.packSequences(
        Sampling.sampleToTokenBudget(wk, "doc_id", "source", "n_tokens",
          budget = 25000L, weights = Seq("src0" -> 0.25, "src1" -> 0.25,
            "src2" -> 0.25, "src3" -> 0.25)),
        "doc_id", col("n_tokens"), "source", seqLen = 2048).count()
      spark.catalog.clearCache()
      w.unpersist(blocking = true)
      println("warmup done (untimed)")
    }

    for (n <- sizes) {
      // Deployment sizing rule, applied per rung: shuffle partitions
      // scale with data so rows-per-partition stays ~constant (the
      // brief's "size shuffle.partitions so partitions fit in executor
      // memory at the target SF"). At a FIXED 32 partitions the ladder's
      // distinct-heavy aggregates (segment df count, gram semi-join)
      // grow their per-partition hash state linearly with the corpus,
      // cross the in-memory threshold and spill — a super-linear wall
      // time that measures the MISCONFIGURATION, not the operator (run
      // 3 of this probe: q63.strip 21.6 s at 2M but 98.8 s at 4M on 32
      // partitions). A 100 TB cluster runs tens of thousands of shuffle
      // partitions for exactly this reason.
      val parts = math.max(spark.sparkContext.defaultParallelism,
        (n / 31250).toInt) // ≈31k docs (~10 MB of text) per partition
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      println(s"=== corpus $n docs x $wpd words " +
        s"(shuffle.partitions=$parts) ===")
      val docs = corpus(n)
      docs.count() // untimed materialization

      // ---- q63 chain, stage by stage (each stage's input is a fully
      // materialized cache, so a stage times only its own work) ----
      val stripped = persistedStage("q63.strip", n,
        Curation.stripBoilerplate(docs, "doc_id", "text",
          separator = " ", minDocs = Right(0.8)))
      val deduped = persistedStage("q63.dedup", n,
        Dedup.exactDedup(stripped, "doc_id", "text_clean"))
      val decon = persistedStage("q63.decon", n,
        Curation.decontaminate(
          deduped.filter(col("doc_id") >= 1000), "doc_id", "text_clean",
          docs.filter(col("doc_id") < 1000), "text", n = 6))
      actionStage("q63.pack", n)(Curation.packSequences(
        decon.join(docs.select("doc_id", "source"), "doc_id"),
        "doc_id", TextFunctions.tokenCount(col("text_clean")),
        "source", seqLen = 2048).count())
      stripped.unpersist(); deduped.unpersist(); decon.unpersist()
      spark.catalog.clearCache(); docs.persist(); docs.count()

      // ---- q77 chain, stage by stage ----
      val kept = persistedStage("q77.quality", n,
        Curation.qualityFilter(docs, "doc_id", "text",
            minStopwordRatio = 0.0, maxDupSegmentFrac = 0.95,
            separator = " ")
          .filter(col("keep"))
          .join(docs.select("doc_id", "source"), "doc_id")
          .select("doc_id", "source", "n_tokens"))
      val budget = n.toLong * wpd / 100 // ~1% of corpus tokens
      val mixed = persistedStage("q77.mix", n,
        Sampling.sampleToTokenBudget(kept, "doc_id", "source",
          "n_tokens", budget = budget,
          weights = Seq("src0" -> 0.25, "src1" -> 0.25, "src2" -> 0.25,
            "src3" -> 0.25)))
      actionStage("q77.pack", n)(Curation.packSequences(mixed, "doc_id",
        col("n_tokens"), "source", seqLen = 2048).count())
      kept.unpersist(); mixed.unpersist()
      spark.catalog.clearCache()
      docs.unpersist(blocking = true)
      System.gc()
    }

    // ---- q63 stage-barrier adjudication at the top size: one composed
    // job, persist on the deduped stage vs none (decontaminate branches
    // its input, so without the barrier the strip→dedup subtree
    // recomputes once per branch) ----
    // The barrier arm MATERIALIZES the persisted stage (persist + count
    // — the in-memory form of writing the stage table) before the output
    // action; a lazy persist inside one action races its own cache
    // population and measures nothing. Arms alternate, min of `reps`
    // per arm, so ambient drift hits both equally.
    println(s"=== barrier adjudication at $barrierSize docs ===")
    val docs = corpus(barrierSize)
    docs.count()
    def chain(barrier: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val stripped = Curation.stripBoilerplate(docs, "doc_id", "text",
        separator = " ", minDocs = Right(0.8))
      val dedupedRaw = Dedup.exactDedup(stripped, "doc_id", "text_clean")
      val deduped = if (barrier) {
        val d = dedupedRaw.persist(); d.count(); d
      } else dedupedRaw
      val decon = Curation.decontaminate(
        deduped.filter(col("doc_id") >= 1000), "doc_id", "text_clean",
        docs.filter(col("doc_id") < 1000), "text", n = 6)
      val out = Curation.packSequences(
        decon.join(docs.select("doc_id", "source"), "doc_id"),
        "doc_id", TextFunctions.tokenCount(col("text_clean")),
        "source", seqLen = 2048).count()
      if (barrier) deduped.unpersist()
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val barrierTimes = collection.mutable.Map.empty[Boolean, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; barrier <- Seq(true, false)) {
      spark.catalog.clearCache(); docs.persist(); docs.count()
      System.gc(); Thread.sleep(50)
      val (rows, t) = chain(barrier)
      barrierTimes(barrier) = t :: barrierTimes(barrier)
      println(f"  composed q63 chain barrier=$barrier%-5s ${t}%8.2f s  ($rows rows)")
    }
    for (b <- Seq(true, false))
      println(f"  barrier=$b%-5s min ${barrierTimes(b).min}%8.2f s " +
        s"(samples ${barrierTimes(b).reverse.map(t => f"$t%.1f").mkString(", ")})")

    // ---- linearity table: seconds and the per-rung growth ratio vs the
    // corpus ratio (ratio ≈ size ratio ⇒ linear; ≫ ⇒ super-linear) ----
    println("\n=== per-stage linearity (seconds; growth ratio vs prior rung) ===")
    val header = "stage".padTo(14, ' ') +
      sizes.map(s => f"$s%12d").mkString + "   growth-ratios"
    println(header)
    for ((stage, bySize) <- results) {
      val ts = sizes.map(bySize.getOrElse(_, Double.NaN))
      val ratios = ts.sliding(2).collect {
        case Seq(a, b) if a > 0 => f"${b / a}%.2f"
      }.mkString("/")
      val sizeRatios = sizes.sliding(2).collect {
        case Seq(a, b) => f"${b.toDouble / a}%.1f"
      }.mkString("/")
      println(stage.padTo(14, ' ') +
        ts.map(t => f"$t%12.2f").mkString + s"   $ratios (size $sizeRatios)")
    }
    println("\n=== per-stage shuffle bytes (MB; growth ratio vs prior rung) ===")
    for ((stage, bySize) <- shuffles) {
      val bs = sizes.map(s => bySize.getOrElse(s, 0L) / 1048576.0)
      val ratios = bs.sliding(2).collect {
        case Seq(a, b) if a > 0 => f"${b / a}%.2f"
      }.mkString("/")
      println(stage.padTo(14, ' ') +
        bs.map(b => f"$b%12.0f").mkString + s"   $ratios")
    }
    spark.stop()
  }
}
