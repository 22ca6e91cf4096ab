package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential checks for the curation operators against naive
  * in-memory Scala reimplementations on seeded random corpora — evidence
  * independent of the DuckDB oracles and the hand-picked spec fixtures.
  * Seeds are fixed, so failures reproduce.
  */
class CurationPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation-property-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def trials(n: Int)(body: scala.util.Random => Unit): Unit =
    (1 to n).foreach(seed => body(new scala.util.Random(seed)))

  private def randText(rnd: scala.util.Random, maxWords: Int): String =
    List.fill(rnd.nextInt(maxWords + 1))("w" + rnd.nextInt(8)).mkString(" ")

  private def wordGrams(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("contaminationReport ≡ naive n-gram set intersection") {
    trials(10) { rnd =>
      val docs = (1L to 20L).map(i => (i, randText(rnd, 12)))
      val bench = (1L to 3L).map(i => (i, randText(rnd, 12)))
      val n = 1 + rnd.nextInt(3)
      val got = Curation.contaminationReport(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          bench.toDF("bench_id", "text"), "text", n)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      val benchSet = bench.flatMap(b => wordGrams(b._2, n)).toSet
      docs.foreach { case (id, text) =>
        val grams = wordGrams(text, n)
        val matched = (grams intersect benchSet).size.toLong
        assert(got(id) == ((grams.size.toLong, matched, matched >= 1)),
          s"doc $id text='$text' n=$n bench=$bench")
      }
    }
  }

  test("charEntropyReport ≡ naive bigram entropy") {
    trials(10) { rnd =>
      val docs = (1L to 15L).map(i => (i, randText(rnd, 10)))
      val got = Curation.charEntropyReport(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      def log2(x: Double): Double = math.log(x) / math.log(2.0)
      docs.foreach { case (id, text) =>
        val t = text.toLowerCase
        // per-doc-report discipline: short docs report (0, NULL), never vanish
        if (t.length < 2) assert(got(id) == ((0L, None)), s"doc $id '$text'")
        else {
          val counts = t.sliding(2).toSeq.groupBy(identity).view
            .mapValues(_.size.toLong).toMap
          val n = counts.values.sum.toDouble
          val h = log2(n) -
            counts.toSeq.sortBy(_._1).map { case (_, c) => c * log2(c.toDouble) }
              .sum / n
          val (gn, gh) = got(id)
          assert(gn == n.toLong && gh.exists(x => math.abs(x - h) < 1e-6),
            s"doc $id text='$text' want ($n, $h) got ($gn, $gh)")
        }
      }
    }
  }

  test("unigramBitsPerToken ≡ naive corpus-distribution surprisal") {
    trials(10) { rnd =>
      val docs = (1L to 12L).map(i => (i, randText(rnd, 10)))
      val got = Curation.unigramBitsPerToken(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      def log2(x: Double): Double = math.log(x) / math.log(2.0)
      val all = docs.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
      val corpus = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = all.size.toDouble
      docs.foreach { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        // token-less docs report (0, NULL), never vanish from the report
        if (toks.isEmpty) assert(got(id) == ((0L, None)), s"doc $id")
        else {
          val bits = -toks.map(t => log2(corpus(t) / total)).sum / toks.length
          val (gn, gb) = got(id)
          assert(gn == toks.length && gb.exists(x => math.abs(x - bits) < 1e-6),
            s"doc $id text='$text' want $bits got $gb")
        }
      }
    }
  }

  test("unigramBitsPerToken: broadcastVocab=false (shuffle-join path) ≡ broadcast path") {
    trials(3) { rnd =>
      val docs = (1L to 12L).map(i => (i, randText(rnd, 10))).toDF("doc_id", "text")
      def rows(broadcastVocab: Boolean) =
        Curation.unigramBitsPerToken(docs, "doc_id", "text", broadcastVocab)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows(broadcastVocab = false) == rows(broadcastVocab = true))
    }
  }

  test("perGroupSampleExact ≡ md5-rank window; groups under n keep all rows") {
    trials(5) { rnd =>
      val rows = (1L to 80L).map(i => (i, "g" + rnd.nextInt(5)))
      val n = 1 + rnd.nextInt(6)
      val got = Sampling.perGroupSampleExact(rows.toDF("doc_id", "grp"),
          "doc_id", "grp", n)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (id, _) =>
          (java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString, id)
        }.take(n)
      }.toSet
      assert(got == want, s"n=$n")
    }
  }

  test("topPerGroup ≡ naive per-group sort on random data") {
    trials(10) { rnd =>
      val rows = (1L to 60L).map(i =>
        (i, "g" + rnd.nextInt(4), rnd.nextInt(6).toDouble))
      val k = 1 + rnd.nextInt(4)
      val got = Sampling.topPerGroup(rows.toDF("doc_id", "grp", "score"),
          "doc_id", "grp", "score", k)
        .collect().map(r => (r.getLong(0), r.getInt(3))).toSet
      val want = rows.groupBy(_._2).values.flatMap { g =>
        g.sortBy(r => (-r._3, r._1)).take(k).zipWithIndex
          .map { case (r, i) => (r._1, i + 1) }
      }.toSet
      assert(got == want)
    }
  }

  test("stripBoilerplate ≡ naive document-frequency cut") {
    trials(10) { rnd =>
      val docs = (1L to 15L).map(i => (i, randText(rnd, 10)))
      val minDocs = 1 + rnd.nextInt(6)
      val got = Curation.stripBoilerplate(docs.toDF("doc_id", "text"),
          "doc_id", "text", separator = " ", minDocs = minDocs)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // split(" ") on "" yields one empty segment, as Spark's split does
      val segsOf = (t: String) => t.split(" ", -1).toList
      val df = docs.flatMap(d => segsOf(d._2).distinct.map(_ -> d._1))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      docs.foreach { case (id, text) =>
        val expected = segsOf(text).filter(s => df(s) < minDocs).mkString(" ")
        assert(got(id) == expected, s"doc $id text='$text' minDocs=$minDocs df=$df")
      }
      // the unbounded anti-join fallback must agree with the broadcast path
      val shuf = Curation.stripBoilerplateShuffle(docs.toDF("doc_id", "text"),
          "doc_id", "text", " ", Left(minDocs.toLong))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(shuf == got, s"shuffle path diverged: $shuf vs $got")
    }
  }

  test("repetitionReport ≡ naive duplicate/top-bigram fractions") {
    trials(10) { rnd =>
      val docs = (1L to 15L).map(i => (i, randText(rnd, 10)))
      val got = Curation.repetitionReport(docs.toDF("doc_id", "text"),
          "doc_id", "text", separator = " ")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))))
        .toMap
      def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
      docs.foreach { case (id, text) =>
        val segs = text.split(" ", -1).toList
        val nSegs = segs.size.toLong
        val nDistinct = segs.distinct.size.toLong
        val dupFrac = if (nSegs > 0) round6(1.0 - nDistinct.toDouble / nSegs) else 0.0
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
        val bigrams = if (toks.length < 2) Nil else toks.sliding(2).map(_.mkString(" ")).toList
        val nBg = bigrams.size.toLong
        val topBg = if (bigrams.isEmpty) 0L
          else bigrams.groupBy(identity).values.map(_.size).max.toLong
        val topFrac = if (nBg > 0) round6(topBg.toDouble / nBg) else 0.0
        assert(got(id) == ((nSegs, nDistinct, dupFrac, nBg, topBg, topFrac)),
          s"doc $id text='$text'")
      }
    }
  }

  test("dedupeSegments ≡ naive first-occurrence filter") {
    trials(10) { rnd =>
      val docs = (1L to 15L).map(i => (i, randText(rnd, 10)))
      val got = Curation.dedupeSegments(docs.toDF("doc_id", "text"),
          "doc_id", "text", separator = " ")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      docs.foreach { case (id, text) =>
        val segs = text.split(" ", -1).toList
        val expected = segs.zipWithIndex
          .filter { case (s, i) => segs.indexOf(s) == i }
          .map(_._1).mkString(" ")
        assert(got(id) == expected, s"doc $id text='$text'")
      }
    }
  }

  test("vocabulary ≡ naive frequency ranking") {
    trials(10) { rnd =>
      val docs = (1L to 15L).map(i => (i, randText(rnd, 12)))
      val k = 1 + rnd.nextInt(6)
      val got = Curation.vocabulary(docs.toDF("doc_id", "text"), "text", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val counts = docs.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val expected = counts.sortBy { case (t, c) => (-c, t) }.take(k)
      assert(got == expected, s"k=$k docs=$docs")
    }
  }

  test("corpusStats ≡ naive aggregate") {
    trials(10) { rnd =>
      val docs = (1L to 12L).map(i => (i, randText(rnd, 8)))
      val r = Curation.corpusStats(docs.toDF("doc_id", "text"), "text").collect()(0)
      val toks = docs.map(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty).toList)
      val nTokens = toks.map(_.size.toLong).sum
      val nBpe = toks.flatten.map(w => math.ceil(w.length / 4.0).toLong).sum
      val nUnique = docs.map(_._2.toLowerCase.replaceAll("\\s+", " ").trim).distinct.size
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((docs.size.toLong, nTokens, nBpe, nUnique.toLong)), s"docs=$docs")
    }
  }

  test("assignSplit partitions every row into exactly one split") {
    trials(6) { rnd =>
      val n = 100 + rnd.nextInt(200)
      val df = (1L to n.toLong).toDF("doc_id")
      val fr = Seq("a" -> rnd.nextDouble() * 0.4, "b" -> rnd.nextDouble() * 0.4)
      val rows = Sampling.assignSplit(df, "doc_id", fr)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length == n)
      assert(rows.map(_._1).distinct.length == n)
      assert(rows.forall(r => Set("a", "b", "train").contains(r._2)))
    }
  }

  test("chunkDocuments ≡ naive stride windows") {
    trials(10) { rnd =>
      val docs = (1L to 12L).map(i => (i, randText(rnd, 15)))
      val chunk = 2 + rnd.nextInt(5)
      val stride = 1 + rnd.nextInt(chunk)
      val got = Curation.chunkDocuments(docs.toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens = chunk, stride = stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
        (0 until toks.length by stride).map { start =>
          val slice = toks.slice(start, start + chunk)
          (id, (start / stride).toLong, slice.mkString(" "), slice.length.toLong)
        }
      }.toSet
      assert(got == expected, s"chunk=$chunk stride=$stride docs=$docs")
    }
  }

  test("ngramContainmentPairs ≡ naive overlap with df pruning") {
    trials(8) { rnd =>
      val alpha = "abcd"
      val docs = (1L to 12L).map { i =>
        (i, List.fill(6 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString)
      }
      val n = 3
      val maxDf = 1 + rnd.nextInt(8)
      val got = Dedup.ngramContainmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = n, threshold = 0.5, maxDocFreq = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def grams(t: String): Set[String] = {
        val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
        if (norm.length < n) Set.empty
        else norm.sliding(n).toSet
      }
      val g = docs.map { case (id, t) => id -> grams(t) }.toMap
      val df = g.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val pruned = g.view.mapValues(_.filter(x => df(x) <= maxDf)).toMap
      def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ga = pruned(a); gb = pruned(b)
        if ga.nonEmpty && gb.nonEmpty
        ov = (ga intersect gb).size.toDouble / math.min(ga.size, gb.size)
        if ov >= 0.5
      } yield (a, b, round6(ov))).toSet
      assert(got == expected, s"docs=$docs maxDf=$maxDf")
    }
  }

  test("ngramJaccardPairs (hashed gram index) ≡ naive jaccard with df pruning") {
    // Round-17: the fraction-1.0 index carries 64-bit gram hashes
    // (NgramHashSet); the naive reference below computes with STRING gram
    // sets, so any hash-collision-induced divergence in distinct counts,
    // df pruning or join matches fails here.
    trials(8) { rnd =>
      val alpha = "abcd"
      val docs = (1L to 12L).map { i =>
        (i, List.fill(6 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString)
      }
      val n = 3
      val maxDf = 1 + rnd.nextInt(8)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = n, threshold = 0.3, maxDocFreq = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def grams(t: String): Set[String] = {
        val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
        if (norm.length < n) Set.empty
        else norm.sliding(n).toSet
      }
      val g = docs.map { case (id, t) => id -> grams(t) }.toMap
      val df = g.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val pruned = g.view.mapValues(_.filter(x => df(x) <= maxDf)).toMap
      def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ga = pruned(a); gb = pruned(b)
        common = (ga intersect gb).size
        if common > 0
        j = common.toDouble / (ga.size + gb.size - common)
        if j >= 0.3
      } yield (a, b, round6(j))).toSet
      assert(got == expected, s"docs=$docs maxDf=$maxDf")
    }
  }

  test("ngramHashSet distinctness ≡ ngramSet (incl. non-ASCII text)") {
    trials(12) { rnd =>
      val alpha = "abc déñ中"
      val text = List.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.length))).mkString
      val n = 2 + rnd.nextInt(4)
      import org.apache.spark.unsafe.types.UTF8String
      val strings = graft.functions.HashExpressions
        .ngramSetEval(UTF8String.fromString(text), n)
      val hashes = graft.functions.HashExpressions
        .ngramHashSetEval(UTF8String.fromString(text), n)
      assert(hashes.numElements() == strings.numElements(),
        s"text='$text' n=$n: hash-set size ${hashes.numElements()} != " +
          s"string-set size ${strings.numElements()}")
    }
  }

  test("packSequences ≡ naive per-shard concat-and-chunk") {
    trials(10) { rnd =>
      val docs = (1L to 30L).map(i =>
        ("s" + rnd.nextInt(4), i, rnd.nextInt(6).toLong))
      val seqLen = 2L + rnd.nextInt(6)
      val got = Curation.packSequences(docs.toDF("source", "doc_id", "n"),
          "doc_id", col("n"), "source", seqLen)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expected = docs.groupBy(_._1).toList.flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._2).flatMap { case (_, id, n) =>
          val start = cum
          cum += n
          if (n == 0) Nil
          else (start / seqLen to (cum - 1) / seqLen)
            .map(q => (shard, id, start, cum, q))
        }
      }.toSet
      assert(got == expected, s"seqLen=$seqLen docs=$docs")
    }
  }

  test("driftReport ≡ naive bucketing + PSI arithmetic") {
    trials(10) { rnd =>
      val nEdges = 1 + rnd.nextInt(4)
      val edges = Seq.fill(nEdges)(rnd.nextInt(100).toDouble)
        .distinct.sorted match {
          case Nil => Seq(50.0)
          case e => e
        }
      val b = edges.size + 1
      def bucket(v: Double): Int = edges.count(_ <= v)
      val refV = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(120).toDouble)
      val curV = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(120).toDouble)
      val got = Curation.driftReport(refV.toDF("v"), curV.toDF("v"), "v", edges)
        .orderBy("bucket")
        .select("bucket", "ref_n", "cur_n", "psi_term")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.map(_._1).toSeq == (0 until b))
      got.foreach { case (i, rn, cn, psi) =>
        assert(rn == refV.count(bucket(_) == i), s"ref_n bucket $i edges=$edges")
        assert(cn == curV.count(bucket(_) == i), s"cur_n bucket $i edges=$edges")
        val rf = (rn + 0.5) / (refV.size + 0.5 * b)
        val cf = (cn + 0.5) / (curV.size + 0.5 * b)
        val expPsi = BigDecimal((cf - rf) * math.log(cf / rf))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(psi == expPsi, s"psi bucket $i edges=$edges")
      }
      assert(got.map(_._2).sum == refV.size && got.map(_._3).sum == curV.size)
    }
  }

  // ---- quality signals: three-way equivalence on an adversarial corpus ----

  /** Unicode-gnarly random documents: multi-codepoint emoji, combining-dot
    * lowercase expansion (İ), CJK, ASCII punctuation clusters, every Java
    * `\s` whitespace class as separator, NBSP (NOT `\s` — glues tokens),
    * plus null / empty / whitespace-only documents.
    */
  private def gnarlyDoc(rnd: scala.util.Random): String = {
    rnd.nextInt(12) match {
      case 0 => null
      case 1 => ""
      case 2 => Seq(" ", "\t", "\n", "\u000B", "\f", "\r")(rnd.nextInt(6)) * (1 + rnd.nextInt(3))
      case _ =>
        val words = Seq("the", "of", "and", "w1", "w2", "héllo", "ÜBER",
          "İstanbul", "日本語テキスト", "😀😀", "!!!", "a,b.c", "(x)", "e.g.",
          "—", "the!", "w1")
        val seps = Seq(" ", "\t", "\n", "  ", "\u000B", "\r\n", "\f", "\u00A0")
        val n = 1 + rnd.nextInt(14)
        val sb = new StringBuilder
        (1 to n).foreach { i =>
          sb.append(words(rnd.nextInt(words.length)))
          if (i < n) sb.append(seps(rnd.nextInt(seps.length)))
        }
        sb.toString
    }
  }

  private def round6hu(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Naive per-document quality signals with Java-regex semantics: tokens =
    * lowercased text split on `\s+` (empties dropped), lengths = code
    * points, punctuation = ASCII `\p{Punct}` over the ORIGINAL text.
    */
  private def naiveQualitySignals(text: String, separator: String)
      : (Long, Double, Double, Double, Double, Double) = {
    if (text == null) return (0L, 0.0, 0.0, 0.0, 0.0, 0.0)
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
    val nTok = toks.size.toLong
    val mean = if (nTok > 0)
      round6hu(toks.map(t => t.codePointCount(0, t.length).toLong).sum.toDouble / nTok)
      else 0.0
    val cps = text.codePoints().toArray
    val punct = if (cps.nonEmpty)
      round6hu(cps.count(cp => cp < 128 &&
        "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".contains(cp.toChar)).toDouble / cps.length)
      else 0.0
    val stop = if (nTok > 0)
      round6hu(toks.count(graft.functions.TextFunctions.enStopwords.contains).toDouble / nTok)
      else 0.0
    val segs = text.split(java.util.regex.Pattern.quote(separator), -1).toList
    val dup = if (segs.nonEmpty)
      round6hu(1.0 - segs.distinct.size.toDouble / segs.size) else 0.0
    val bigrams = if (toks.length < 2) Nil else toks.sliding(2).map(_.mkString(" ")).toList
    val topFrac = if (bigrams.isEmpty) 0.0
      else round6hu(bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size)
    (nTok, mean, punct, stop, dup, topFrac)
  }

  test("qualityFilter ≡ naive signals + first-failed-rule chain (gnarly unicode corpus)") {
    trials(10) { rnd =>
      val docs = (1L to 40L).map(i => (i, gnarlyDoc(rnd)))
      val minTokens = rnd.nextInt(6).toLong
      val maxTokens = (8 + rnd.nextInt(13)).toLong
      val minMeanWordLen = rnd.nextDouble() * 2.5
      val maxMeanWordLen = 3.0 + rnd.nextDouble() * 9.0
      val maxPunctRatio = rnd.nextDouble() * 0.4
      val minStopwordRatio = rnd.nextDouble() * 0.2
      val maxDupSegmentFrac = rnd.nextDouble() * 0.5
      val maxTopBigramFrac = rnd.nextDouble() * 0.5
      val got = Curation.qualityFilter(docs.toDF("doc_id", "text"),
          "doc_id", "text", minTokens, maxTokens, minMeanWordLen,
          maxMeanWordLen, maxPunctRatio, minStopwordRatio,
          maxDupSegmentFrac, maxTopBigramFrac, separator = "\n")
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1).toLong, r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          Option(r.getString(7)), r.getBoolean(8))))
        .toMap
      docs.foreach { case (id, text) =>
        val (nTok, mean, punct, stop, dup, topBg) =
          naiveQualitySignals(text, "\n")
        val reason =
          if (nTok < minTokens) Some("too_few_tokens")
          else if (nTok > maxTokens) Some("too_many_tokens")
          else if (mean < minMeanWordLen || mean > maxMeanWordLen) Some("word_length")
          else if (punct > maxPunctRatio) Some("punctuation")
          else if (stop < minStopwordRatio) Some("stopwords")
          else if (dup > maxDupSegmentFrac) Some("repeated_segments")
          else if (topBg > maxTopBigramFrac) Some("repeated_bigrams")
          else None
        assert(got(id) == ((nTok, mean, punct, stop, dup, topBg, reason, reason.isEmpty)),
          s"doc $id text=${Option(text).map(t => "'" + t + "'")}")
      }
    }
  }

  test("TextStats codegen pass ≡ TextFunctions HOF columns (gnarly unicode corpus)") {
    // Spark's own regexp/higher-order-function machinery as an independent
    // oracle for the codegen row pass that replaced it (round-13 rewrite):
    // same tokens, code-point lengths, ASCII punct class, stopword set.
    trials(10) { rnd =>
      val docs = (1L to 40L).map(i => (i, gnarlyDoc(rnd)))
      val tf = graft.functions.TextFunctions
      val ts = graft.functions.HashExpressions
        .textStats(col("text"), tf.enStopwords)
      val nTok = ts.getField("n_tokens")
      val nChars = ts.getField("n_chars")
      val rows = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          nTok.cast("long").as("a_tok"),
          when(nTok > 0, round(ts.getField("sum_word_len").cast("double") / nTok, 6))
            .otherwise(lit(0.0)).as("a_mean"),
          when(nChars > 0, round(ts.getField("n_punct").cast("double") / nChars, 6))
            .otherwise(lit(0.0)).as("a_punct"),
          when(nTok > 0, round(ts.getField("n_stopwords").cast("double") / nTok, 6))
            .otherwise(lit(0.0)).as("a_stop"),
          tf.tokenCount(col("text")).cast("long").as("b_tok"),
          round(tf.meanWordLen(col("text")), 6).as("b_mean"),
          round(tf.punctRatio(col("text")), 6).as("b_punct"),
          round(tf.stopwordRatio(col("text")), 6).as("b_stop"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(5) && r.getDouble(2) == r.getDouble(6) &&
          r.getDouble(3) == r.getDouble(7) && r.getDouble(4) == r.getDouble(8),
          s"doc ${r.getLong(0)}: codegen ${(r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4))} vs HOF ${(r.getLong(5), r.getDouble(6), r.getDouble(7),
            r.getDouble(8))} text=${docs.find(_._1 == r.getLong(0)).map(_._2)}")
      }
    }
  }
}
