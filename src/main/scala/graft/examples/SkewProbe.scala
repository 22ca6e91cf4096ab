package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-stress probe: the hot-key pathologies a zipfian 100 TB corpus throws
  * at the aggregation/banding paths, measured at two scales so the SLOPE is
  * the verdict, not one wall time. Covers the three operators whose skew
  * levers exist specifically for this case:
  *
  *  - `assembleSequences` with `maxItems`: one key holds ~50% of all rows
  *    (zipf-2 keys: `key = n div (id+1)` puts n/2 rows on key 1). The rank
  *    cap bounds both the emitted example and the per-group collect buffer.
  *  - `topPerGroup`: same zipf groups; the bounded CollectTopK aggregate
  *    keeps O(k) state per group at every aggregation level regardless of
  *    group size.
  *  - `minHashNearDuplicates` with `maxBucket`: a planted exact-duplicate
  *    mega-cluster (5% of docs share one text) makes one band bucket
  *    quadratic; the bucket-population guard clips it.
  *
  * Deterministic (no RNG) so runs are comparable. Near-linear slope = a
  * 4× data step costs ≲ ~5× wall (allowing constant overheads); quadratic
  * blowup shows as ≳ 10×.
  *
  * Usage: sbt "runMain graft.examples.SkewProbe [baseRows]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Curation, Dedup, Sampling}

    def timed(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label: $dt%.2f s ($rows rows)")
      spark.catalog.clearCache()
      dt
    }
    def slope(label: String, small: Double, big: Double, step: Int): Unit =
      println(f"$label slope: ${big / small}%.2f x for a $step x data step " +
        (if (big / small < step * 1.3) "(near-linear)" else "(SUPRA-LINEAR - investigate)"))

    // zipf-2 keys: key = n div (id+1). Key 1 carries ~n/2 rows, key 2 ~n/6,
    // ... — the long tail plus one mega-hot key.
    def zipfRows(n: Int) = spark.range(n.toLong).select(
      expr(s"$n div (id + 1)").as("key"),
      col("id").as("ord"),
      conv(pmod(xxhash64(col("id")), lit(60466176L)).cast("string"), 10, 36)
        .as("v"))

    for (step <- Seq(1, 4)) {
      val n = base * step
      println(s"--- zipf keys, n=$n (hot key ~${n / 2} rows) ---")
      val rows = zipfRows(n).persist(); rows.count()
      val tAsm = timed(s"assembleSequences maxItems=1000 (n=$n)") {
        Curation.assembleSequences(rows, "key", "ord", "ord", "v",
          maxItems = 1000).count()
      }
      val tTop = timed(s"topPerGroup k=10 (n=$n)") {
        rows.sparkSession.catalog.clearCache(); rows.persist(); rows.count()
        Sampling.topPerGroup(rows.withColumn("score",
          pmod(col("ord"), lit(997)).cast("double")), "ord", "key", "score",
          k = 10).count()
      }
      rows.unpersist()
      if (step == 1) { asm1 = tAsm; top1 = tTop }
      else { slope("assembleSequences", asm1, tAsm, step)
             slope("topPerGroup", top1, tTop, step) }
    }

    // Hot-bucket minhash: 5% of docs share ONE text (an exact-dup
    // mega-cluster, ~m=n/20 members -> m^2/2 in-bucket candidates without
    // the guard). Probe at base/10 scale: the unguarded run is the
    // quadratic one, keep it affordable.
    val nd = base / 10
    def hotDocs(n: Int) = spark.range(n.toLong).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(20)) === 0, lit("the exact same boilerplate page text repeated verbatim"))
        .otherwise(array_join(transform(sequence(lit(1), lit(20)),
          i => conv(pmod(xxhash64(col("id") * lit(1000003L) + i),
            lit(60466176L)).cast("string"), 10, 36)), " "))
        .as("text"))
    println(s"--- minhash hot bucket, n=$nd (mega-cluster ${nd / 20} docs) ---")
    val docs = hotDocs(nd).persist(); docs.count()
    val tOff = timed("minhash pairs, NO bucket guard (quadratic cluster)") {
      Dedup.minHashNearDuplicates(docs, "doc_id", "text",
        threshold = 0.8, numHashes = 8, bands = 4).count()
    }
    docs.persist(); docs.count()
    val tOn = timed("minhash pairs, maxBucket=64 (guard clips the cluster)") {
      Dedup.minHashNearDuplicates(docs, "doc_id", "text",
        threshold = 0.8, numHashes = 8, bands = 4, maxBucket = 64).count()
    }
    println(f"bucket guard speedup: ${tOff / tOn}%.1f x at n=$nd")
    docs.unpersist()
    spark.stop()
  }

  private var asm1 = 0.0
  private var top1 = 0.0
}
