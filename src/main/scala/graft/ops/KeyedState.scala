package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The keyed streaming-state discipline shared by every foreachBatch sink
  * that accumulates partitioned parquet state ([[Dedup]]'s band index and
  * shingle store, [[Similarity.streamingIvfIngest]]'s cell index):
  *
  *   - state lives in `path/<partCol>=<value>/` partition dirs, keyed so
  *     a probe by key prunes the scan to its own partitions;
  *   - each batch appends ONE file per touched partition (an explicit
  *     repartition count before the dynamic-partition write — a bare
  *     `repartition(col)` re-plans under AQE and measured 3× slower);
  *   - any touched partition that accumulates more than `maxFiles`
  *     parquet files is rewritten down to one file, so the sink's file
  *     listing stays O(partitions) however many batches arrive — at one
  *     appended file per partition per batch the rewrite fires at most
  *     once per `maxFiles` batches per partition, bounding the amortized
  *     cost.
  *
  * Compaction decisions are driver fs LISTINGS (≤ one `listStatus` per
  * candidate partition), never data reads; nothing fires until some
  * partition crosses the threshold.
  *
  * CRASH SAFETY: compaction must never be the operation that loses
  * accumulated state — the appends it rewrites are fenced by replay
  * markers, so a lost row cannot be re-derived. Both compactors
  * therefore stage the rewrite into a SIBLING dir and swap with renames,
  * keeping a restorable copy of the original until the swap completes;
  * [[repairPartitions]]/[[repairFlat]] heal any interruption (called at
  * the start of every compaction, and cheap enough — one `exists` when
  * clean — for sinks to call before their final read). At every instant
  * the original rows exist under the live path or under the `__old`
  * sibling, never nowhere. (Stage/old dirs are siblings, NOT inside the
  * partitioned root: a stray `<partCol>=K__old` dir inside the root
  * would break partition-value inference for every read.)
  */
object KeyedState {

  /** Hash bucket for key columns: a pure function of the key, so a probe
    * by key touches exactly one bucket and bucket-pruned joins are
    * exactly equivalent to full-state joins. */
  def bucketColumn(keys: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")

  /** Append into `path/<partCol>=<v>/` dirs, one file per touched
    * partition value. Empty frames are skipped: a zero-row partitioned
    * write creates no files, leaving a dir the next read cannot infer a
    * schema from. `numTasks` bounds the write's task count (each
    * partition value still lands wholly in one task, so files per batch
    * = touched partition values). */
  def appendPartitioned(df: DataFrame, path: String, partCol: String,
      numTasks: Int): Unit =
    if (!df.isEmpty)
      df.repartition(numTasks, col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(path)

  // ---- staged-swap batch appends ---------------------------------------
  //
  // A bare mode("append") under an [[Upsert.applyBatchOnce]] fence leaves
  // one documented crash window: a crash INSIDE the parquet job commit
  // (FileOutputCommitter moves task outputs into the live dir file by
  // file) lands SOME of the batch's files without the replay marker, and
  // the replayed batch then appends a full second copy next to the
  // partial first. The staged variants close it: the batch writes to a
  // SIBLING staged dir (a crash inside THAT job commit touches only the
  // staged dir, which the replay deletes), a `_FENCE` file marks the
  // staged write complete, and publication moves each staged file into
  // the live dir under a batch-prefixed name. Each per-file rename is
  // atomic, so at every instant a staged file exists in exactly one of
  // the two dirs, and every crash point replays to the same final state:
  //
  //   - crash before `_FENCE` (incl. inside the staged job commit):
  //     replay deletes the unfenced staged dir and rewrites;
  //   - crash mid-publication: the fenced staged dir survives, replay
  //     resumes moving whatever files remain;
  //   - crash after publication, before the staged-dir delete: replay
  //     finds a fenced staged dir with no data files left and just
  //     cleans up;
  //   - crash after the staged delete, before the caller's replay
  //     marker: the live dir's `b<batchId>_` files prove publication
  //     completed (they exist only after a fence existed, and the staged
  //     dir is deleted only after every file moved), so replay returns
  //     without re-appending.
  //
  // Staged dirs are SIBLINGS of the live root (`<path>__staged_b<id>`),
  // never inside it — a stray non-partition dir inside a partitioned
  // root breaks partition-value inference for every read (the compactor
  // discipline above).

  private def stagedDir(path: String, batchId: Long): Path =
    new Path(path + s"__staged_b$batchId")

  private def dataFiles(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      if (st.isDirectory) dataFiles(fs, st.getPath)
      else if (st.getPath.getName.startsWith("part-")) Seq(st)
      else Seq.empty
    }

  /** Move every remaining staged data file into the live tree under its
    * batch-prefixed name, preserving the partition subdir, then drop the
    * staged dir. Idempotent: re-runs move whatever is left. */
  private def publishStaged(fs: FileSystem, staged: Path, live: Path,
      batchId: Long): Unit = {
    // listStatus returns QUALIFIED paths (scheme + authority); qualify the
    // root too or the flat-dir parent comparison below never matches
    val stagedQ = fs.makeQualified(staged)
    for (st <- dataFiles(fs, staged)) {
      val rel = st.getPath.getParent
      val destDir =
        if (rel == stagedQ) live
        else new Path(live, rel.getName) // one partition level (partCol=v)
      fs.mkdirs(destDir)
      val dest = new Path(destDir, s"b${batchId}_${st.getPath.getName}")
      if (fs.exists(dest)) fs.delete(st.getPath, false)
      else fs.rename(st.getPath, dest)
    }
    fs.delete(staged, true)
  }

  /** True iff some live data file carries this batch's publication prefix
    * — the witness that a previous attempt published completely (see the
    * crash-window table above). Driver-side listing, O(partition dirs). */
  private def livePublished(fs: FileSystem, live: Path, batchId: Long): Boolean =
    fs.exists(live) && fs.listStatus(live).exists { st =>
      val p = s"b${batchId}_"
      if (st.isDirectory)
        fs.listStatus(st.getPath).exists(_.getPath.getName.startsWith(p))
      else st.getPath.getName.startsWith(p)
    }

  /** [[appendPartitioned]] with the staged-swap protocol: atomic per
    * batch under crashes anywhere, including inside the write's own job
    * commit. Pair with [[Upsert.applyBatchOnce]] — the fence skips the
    * common full-replay case cheaply; this closes the torn-commit window
    * the fence cannot see. */
  def appendPartitionedAtomic(df: DataFrame, path: String, partCol: String,
      numTasks: Int, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    val staged = stagedDir(path, batchId)
    val live = new Path(path)
    val fence = new Path(staged, "_FENCE")
    if (fs.exists(staged) && fs.exists(fence)) {
      publishStaged(fs, staged, live, batchId); return
    }
    if (fs.exists(staged)) fs.delete(staged, true) // unfenced partial write
    if (livePublished(fs, live, batchId)) return   // already fully published
    if (df.isEmpty) return
    df.repartition(numTasks, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(staged.toString)
    fs.create(fence, true).close()
    // Injected-crash point (test-only, [[Failpoint]]): the staged write
    // is complete and fenced but NOTHING is published — the torn-commit
    // window a bare append cannot survive. CrashRecoverySpec kills a
    // stream here and proves the checkpoint replay resumes publication.
    Failpoint.hit(spark, "staged_post_fence", batchId)
    publishStaged(fs, staged, live, batchId)
  }

  /** [[appendPartitionedAtomic]] for FLAT (unpartitioned) append dirs,
    * coalesced to `numFiles` output files per batch. */
  def appendFlatAtomic(df: DataFrame, path: String, numFiles: Int,
      batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    val staged = stagedDir(path, batchId)
    val live = new Path(path)
    val fence = new Path(staged, "_FENCE")
    if (fs.exists(staged) && fs.exists(fence)) {
      publishStaged(fs, staged, live, batchId); return
    }
    if (fs.exists(staged)) fs.delete(staged, true)
    if (livePublished(fs, live, batchId)) return
    if (df.isEmpty) return
    df.coalesce(numFiles).write.mode("overwrite").parquet(staged.toString)
    fs.create(fence, true).close()
    Failpoint.hit(spark, "staged_post_fence_flat", batchId)
    publishStaged(fs, staged, live, batchId)
  }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stageRoot(path: String) = new Path(path + "__compact_tmp")
  private def oldRoot(path: String) = new Path(path + "__compact_old")

  /** Heal an interrupted [[compactPartitions]] swap: any partition dir
    * preserved under the `__old` sibling whose live dir is MISSING was
    * caught between the two renames — restore it; one whose live dir
    * exists was already swapped — drop the preserved copy. One `exists`
    * call when there is nothing to heal. */
  def repairPartitions(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val old = oldRoot(path)
    if (!fs.exists(old)) return
    fs.listStatus(old).foreach { st =>
      val live = new Path(path, st.getPath.getName)
      if (!fs.exists(live)) fs.rename(st.getPath, live)
      else fs.delete(st.getPath, true)
    }
    fs.delete(old, true)
    fs.delete(stageRoot(path), true)
  }

  /** Rewrite any of the given partition values whose parquet-file count
    * exceeds `maxFiles` down to one file each. The compacted copy is
    * staged to a sibling dir, then each partition swaps via
    * preserve-rename / stage-rename / drop-preserved — a crash at any
    * point leaves the original rows restorable by [[repairPartitions]]
    * (which also runs first, healing any earlier interruption). */
  def compactPartitions(spark: SparkSession, path: String, partCol: String,
      values: Seq[Any], maxFiles: Int): Unit = {
    repairPartitions(spark, path)
    val fs = fsOf(spark, path)
    val oversized = values.filter { v =>
      val dir = new Path(s"$path/$partCol=$v")
      fs.exists(dir) && fs.listStatus(dir)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFiles
    }
    if (oversized.isEmpty) return
    val stage = stageRoot(path)
    val old = oldRoot(path)
    fs.delete(stage, true)
    val rows = spark.read.parquet(path)
      .filter(col(partCol).isin(oversized: _*))
      .repartition(oversized.size, col(partCol))
      .localCheckpoint(true)
    try rows.write.partitionBy(partCol).parquet(stage.toString)
    finally rows.unpersist()
    fs.mkdirs(old)
    oversized.foreach { v =>
      val name = s"$partCol=$v"
      val staged = new Path(stage, name)
      val live = new Path(path, name)
      if (fs.exists(staged)) {
        // preserve, swap, drop — original restorable until the swap lands
        if (fs.exists(live)) fs.rename(live, new Path(old, name))
        fs.rename(staged, live)
        fs.delete(new Path(old, name), true)
      }
    }
    fs.delete(old, true)
    fs.delete(stage, true)
  }

  /** Distinct partition values present in a one-column frame — bounded
    * by the partition count, the same driver-side footprint as
    * [[Upsert.upsertKeyedParquet]]'s affected-bucket collect. */
  def touchedValues(values: DataFrame): Seq[Any] =
    values.distinct().collect().map(_.get(0)).toSeq

  /** Name of the kept-files manifest a tiered [[compactFlat]] stages with
    * its merged file. Underscore-prefixed so Spark's parquet reader
    * treats it as metadata and never lists it as data. */
  private val keptManifest = "_KEPT"

  /** Does this sink/state dir hold any DATA — a `__bucket=` partition dir
    * or a bare parquet file? Mere existence is not it: the `_PARAMS`
    * stamp and `_applied` replay markers create the directory before any
    * batch writes, and treating that as "data present" flips writers into
    * their merge path against a frame schema inference cannot build. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(spark, path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val nm = st.getPath.getName
      nm.contains("=") || nm.endsWith(".parquet")
    }
  }

  /** Layout-parameter stamp for a persistent keyed state/sink dir: the
    * first run writes `_PARAMS` (sorted `k=v` lines); every later run
    * REQUIRES equality. Bucket counts, signature widths, band counts and
    * gram lengths are baked into the stored bytes — a re-run with a
    * drifted value doesn't error, it silently probes nonexistent buckets
    * or compares unmatchable signatures (missed pairs, corrupt merges).
    * Same discipline as the benchmark index's `_gram_n` stamp; the
    * underscore name keeps it out of Spark's data listing, and bucketed
    * dirs compact per partition so the root stamp survives compaction. */
  /** Canonical stamp rendering for one parameter value: numeric types
    * render as plain decimal strings (no exponent, no trailing zeros, via
    * BigDecimal), so the SAME number always produces the SAME line
    * however the caller spelled it — `1e-4` and `0.0001` both render
    * `0.0001`, `0.5f` and `0.5` both render `0.5` (floats widen to the
    * double they exactly are; genuinely different values like `0.1f` vs
    * `0.1` stay distinct, as they must — the stored bytes differ). A
    * toString rendering instead varies with literal form and spuriously
    * fails the equality require below. */
  private def renderParam(v: Any): String = v match {
    // non-finite doubles have no BigDecimal form (BigDecimal(NaN) throws
    // NumberFormatException); render them the way toString always did so
    // a caller stamping a non-finite threshold round-trips instead of
    // crashing with an unrelated-looking numeric error
    case d: Double if d.isNaN || d.isInfinite => String.valueOf(d)
    case d: Double =>
      BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case f: Float => renderParam(f.toDouble)
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: BigDecimal => d.bigDecimal.stripTrailingZeros.toPlainString
    case other => String.valueOf(other)
  }

  def stampParams(spark: SparkSession, path: String,
      params: Map[String, Any]): Unit = {
    val fs = fsOf(spark, path)
    val stamp = new Path(path, "_PARAMS")
    val rendered = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${renderParam(v)}" }.mkString("", "\n", "\n")
    if (fs.exists(stamp)) {
      val in = fs.open(stamp)
      val existing =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(existing == rendered,
        s"state dir $path was built with parameters:\n${existing.trim}\n" +
          s"but this run uses:\n${rendered.trim}\n— mismatched layout " +
          "parameters silently corrupt probes and merges; rebuild the " +
          "state dir or restore the original parameters")
    } else {
      fs.mkdirs(new Path(path))
      // temp-file + rename: two concurrent FIRST runs otherwise race
      // check-then-create and one could read a half-written stamp; the
      // rename makes the stamp appear atomically (losing a same-params
      // race is harmless — the rename simply overwrites with identical
      // bytes, and differing params fail the require on the next call).
      val tmp = new Path(path,
        s"._PARAMS.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(rendered.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, stamp)) {
        // a concurrent run won the rename: fall through to the equality
        // check against whatever landed
        fs.delete(tmp, false)
      }
      // Verify by re-read REGARDLESS of the rename's return value:
      // HDFS-style rename refuses an existing destination (returns false
      // → the branch above), but RawLocalFileSystem maps to POSIX rename,
      // which silently OVERWRITES and returns true — two racing first
      // runs with different params would both "succeed" last-writer-wins
      // and neither would ever compare. One small re-read makes the
      // equality check independent of the filesystem's rename-onto-
      // existing semantics.
      val in = fs.open(stamp)
      val landed =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(landed == rendered,
        s"state dir $path was concurrently stamped with parameters:\n" +
          s"${landed.trim}\nbut this run uses:\n${rendered.trim}")
    }
  }

  /** Heal an interrupted [[compactFlat]] swap. Two crash shapes:
    *
    *   - `__old` preserved, live dir MISSING: caught between the two
    *     renames — restore the preserved copy (nothing of the new state
    *     was visible yet).
    *   - `__old` preserved AND live dir present: the staged dir already
    *     swapped in. Under the tiered protocol the live dir holds the
    *     merged file plus a `_KEPT` manifest naming the untouched
    *     generation files still being moved over from `__old` — resume
    *     those metadata renames (idempotent: each name lives in exactly
    *     one of the two dirs) and only then drop `__old`. No manifest
    *     (legacy whole-dir swap) means the live dir is already complete.
    */
  def repairFlat(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val old = oldRoot(path)
    if (!fs.exists(old)) return
    val live = new Path(path)
    if (!fs.exists(live)) fs.rename(old, live)
    else {
      val manifest = new Path(live, keptManifest)
      if (fs.exists(manifest)) {
        val in = fs.open(manifest)
        val names =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toList
          finally in.close()
        names.foreach { n =>
          val src = new Path(old, n)
          if (fs.exists(src)) fs.rename(src, new Path(live, n))
        }
        fs.delete(old, true)
        fs.delete(manifest, false)
      } else fs.delete(old, true)
    }
    fs.delete(stageRoot(path), true)
  }

  /** Rewrite a FLAT (unpartitioned) append sink down to at most
    * `maxFiles` files (one fresh merge + up to `maxFiles − 1` kept
    * generations) once its parquet-file count exceeds
    * `maxFiles` — for append-only OUTPUT dirs (e.g. a streaming query's
    * accumulated result rows) that gain one file per batch and are read
    * in full at the end, where the keyed layouts above don't apply. The
    * decision is one driver `listStatus`; the rewrite stages to a
    * sibling dir and swaps via preserve-rename / stage-rename /
    * drop-preserved, so a crash at any point leaves the original
    * restorable by [[repairFlat]] (which also runs first).
    *
    * GENERATION-TIERED: only the SMALLEST files merge — at minimum the
    * `n − (maxFiles − 1)` needed to land back under the threshold, then
    * greedily absorbing each next-smallest file whose size is at most
    * the running sum (the size-doubling rule). Files that stay out of
    * the merge — prior compacted generations — move into the new live
    * dir by pure metadata RENAME, never a data rewrite, so a byte is
    * rewritten only when its generation gets absorbed by an
    * equal-or-larger pile: O(log n) rewrites per byte over a stream's
    * lifetime, where the old rewrite-everything policy was quadratic in
    * accumulated output. Swap order: merged file (+ `_KEPT` manifest
    * naming the generations) is staged; live renames to `__old`
    * (complete copy preserved); stage renames to live; kept generations
    * rename `__old` → live one by one; `__old` (now only the absorbed
    * smalls) and the manifest are dropped. A crash at ANY point is
    * healed by [[repairFlat]]: before the stage swap the preserved copy
    * restores wholesale; after it the manifest says exactly which
    * renames remain, and each file exists in exactly one of the two
    * dirs. `numFiles` is retained for signature compatibility; a tiered
    * merge always produces one file (the generation unit). */
  def compactFlat(spark: SparkSession, path: String, maxFiles: Int,
      numFiles: Int = 8): Unit = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    repairFlat(spark, path)
    val p = new Path(path)
    val fs = fsOf(spark, path)
    if (!fs.exists(p)) return
    val parquet = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(st => (st.getLen, st.getPath.getName))
    if (parquet.length <= maxFiles) return
    // merge the smallest `mustMerge` files (lands the count back under
    // maxFiles: 1 merged file + at most maxFiles - 1 kept generations),
    // then keep absorbing the next-smallest while it is no larger than
    // the pile built so far — the size-doubling rule that bounds
    // per-byte rewrites to O(log n) over the sink's lifetime.
    // maxFiles = 1 merges EVERYTHING (mustMerge = n): with no kept slot
    // available, anything less would leave 2 files, and every later call
    // would rewrite the small file again without ever converging.
    val mustMerge = parquet.length - math.max(0, maxFiles - 1)
    var sum = parquet.take(mustMerge).map(_.getLen).sum
    val m = parquet.take(mustMerge) ++
      parquet.drop(mustMerge).takeWhile { st =>
        val take = st.getLen <= sum
        if (take) sum += st.getLen
        take
      }
    val kept = parquet.map(_.getPath.getName)
      .filterNot(m.map(_.getPath.getName).toSet).toSeq
    val rows = spark.read
      .parquet(m.map(_.getPath.toString): _*).localCheckpoint(true)
    val stage = stageRoot(path)
    try {
      fs.delete(stage, true)
      rows.coalesce(1).write.parquet(stage.toString)
    } finally rows.unpersist()
    if (kept.nonEmpty) {
      val out = fs.create(new Path(stage, keptManifest), true)
      try out.write((kept.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    val old = oldRoot(path)
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(stage, p)
    kept.foreach { n => fs.rename(new Path(old, n), new Path(p, n)) }
    fs.delete(old, true)
    fs.delete(new Path(p, keptManifest), false)
  }
}
