package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM trainer: hand-computed Viterbi cases, the longest-piece tie
  * rule, coverage invariants, and a full naive-replay differential of
  * train() on a random corpus.
  */
class UnigramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-unigramlm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def segment(words: Seq[String],
      costs: Seq[(String, Long)]): Map[String, Seq[String]] = {
    val wdf = words.toDF("w").withColumn("freq", lit(1L))
    val vdf = costs.toDF("piece", "cost_u")
    UnigramLm.viterbiSegment(wdf, "w", vdf, maxPieceLen = 4)
      .select("w", "pieces").as[(String, Seq[String])].collect().toMap
  }

  test("viterbiSegment: hand-computed minimum-cost path") {
    val costs = Seq("a" -> 100L, "b" -> 100L, "ab" -> 150L, "ba" -> 120L,
      "aba" -> 500L)
    val got = segment(Seq("abab", "aab", "b", "ba"), costs)
    // abab: ab+ab=300 beats a+ba+b=320, ab+a+b=350, aba+b=600
    assert(got("abab") == Seq("ab", "ab"))
    // aab: no 'aa' piece -> a+ab=250 beats a+a+b=300
    assert(got("aab") == Seq("a", "ab"))
    assert(got("b") == Seq("b"))
    // ba: 120 beats b+a=200
    assert(got("ba") == Seq("ba"))
  }

  test("viterbiSegment: exact cost ties prefer the longest piece") {
    val got = segment(Seq("xx", "xxx"),
      Seq("x" -> 100L, "xx" -> 200L, "xxx" -> 300L))
    assert(got("xx") == Seq("xx"))
    assert(got("xxx") == Seq("xxx"))
  }

  test("train: coverage and smoothing invariants") {
    val docs = Seq("the cat sat on the mat", "the thematic math")
      .toDF("text")
    val out = UnigramLm.train(docs, "text", vocabSize = 10,
      maxPieceLen = 3, emIters = 2).collect()
    val pieces = out.map(_.getString(0)).toSet
    // every character of every word is a piece (coverage guarantee)
    val chars = "thecatsonmatithemic".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces))
    // +1 smoothing: every count positive, every cost finite and positive
    assert(out.forall(r => r.getLong(1) >= 1L))
    assert(out.forall(r => r.getLong(2) > 0L && r.getLong(2) < (1L << 62)))
  }

  test("fertilityReport: hand-computed counts and exact ppm ratios") {
    // vocab: ab costs less than a+b -> "abab" segments to 2 pieces,
    // "b" to 1. Doc 1: "abab b" = 2 words, 3 pieces, 6 chars.
    val docs = Seq((1L, "abab b", "en", 6L), (2L, "b", "en", 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val vocab = Seq("a" -> 100L, "b" -> 100L, "ab" -> 150L)
      .toDF("piece", "cost_u")
    val got = UnigramLm.fertilityReport(docs, "doc_id", "text", "lang",
        col("n_chars"), vocab, maxPieceLen = 4, maxWordLen = 30)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 3 words, 4 pieces, 7 chars: fertility 4/3 -> 1333333 ppm,
    // chars/token 7/4 -> 1750000 ppm
    assert(got == Seq(("en", 2L, 3L, 7L, 4L, 1333333L, 1750000L)))
  }

  test("viterbiSegment: unsegmentable words yield NULL, not empty pieces") {
    // 'q' is not in the vocabulary: the final DP state is unreachable,
    // so the segmentation must be NULL — not length(w) empty strings.
    val wdf = Seq("ab", "aqb", "q").toDF("w")
    val vdf = Seq("a" -> 100L, "b" -> 100L, "ab" -> 150L)
      .toDF("piece", "cost_u")
    val got = UnigramLm.viterbiSegment(wdf, "w", vdf, maxPieceLen = 4)
      .select("w", "pieces").as[(String, Option[Seq[String]])]
      .collect().toMap
    assert(got("ab") == Some(Seq("ab")))
    assert(got("aqb") == None)
    assert(got("q") == None)
  }

  test("fertilityReport: OOV-char words are excluded, not miscounted") {
    // doc 2's only word is unsegmentable: it contributes n_docs/n_chars
    // but zero words/tokens; doc 1 is unaffected.
    val docs = Seq((1L, "abab b", "en", 6L), (2L, "qq", "en", 2L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val vocab = Seq("a" -> 100L, "b" -> 100L, "ab" -> 150L)
      .toDF("piece", "cost_u")
    val got = UnigramLm.fertilityReport(docs, "doc_id", "text", "lang",
        col("n_chars"), vocab, maxPieceLen = 4, maxWordLen = 30)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 2 docs, 2 words (abab, b), 8 chars, 3 pieces:
    // fertility 3/2 -> 1500000, chars/token 8/3 -> 2666667 (round half up)
    assert(got == Seq(("en", 2L, 2L, 8L, 3L, 1500000L, 2666667L)))
  }

  // ---- naive replay ----

  private def naiveTrain(texts: Seq[String], vocabSize: Int, maxPieceLen: Int,
      emIters: Int, maxWordLen: Int): Map[String, (Long, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .filter(_.length <= maxWordLen)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    def costsOf(vocab: Map[String, Long]): Map[String, Long] = {
      val tot = vocab.values.sum.toDouble
      vocab.map { case (p, n) =>
        p -> math.floor(-math.log(n / tot) * 1e6 + 0.5).toLong
      }
    }
    val subs = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + f
    val singles = subs.filter(_._1.length == 1)
    val multis = subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(vocabSize)
    var vocab = (singles ++ multis).toMap
    var costs = costsOf(vocab)
    val Inf = Long.MaxValue / 2
    def viterbi(w: String): Seq[String] = {
      val best = Array.fill(w.length + 1)((Inf, 0))
      best(0) = (0L, 0)
      for (j <- 1 to w.length; l <- 1 to math.min(maxPieceLen, j)) {
        val p = w.substring(j - l, j)
        costs.get(p).foreach { c =>
          if (best(j - l)._1 < Inf && best(j - l)._1 + c <= best(j)._1)
            best(j) = (best(j - l)._1 + c, l)
        }
      }
      var pos = w.length
      var ps = List.empty[String]
      while (pos > 0) {
        val l = best(pos)._2
        ps = w.substring(pos - l, pos) :: ps
        pos -= l
      }
      ps
    }
    for (_ <- 1 to emIters) {
      val vn = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- words; p <- viterbi(w))
        vn(p) = vn.getOrElse(p, 0L) + f
      vocab = vocab.keys.map(p => p -> (vn.getOrElse(p, 0L) + 1L)).toMap
      costs = costsOf(vocab)
    }
    vocab.keys.map(p => p -> ((vocab(p), costs(p)))).toMap
  }

  test("train matches a naive replay on a random corpus") {
    val rng = new scala.util.Random(11)
    val alphabet = "abcd"
    val texts = Seq.fill(40)(
      Seq.fill(1 + rng.nextInt(8))(
        Seq.fill(1 + rng.nextInt(6))(
          alphabet(rng.nextInt(alphabet.length))).mkString).mkString(" "))
    val got = UnigramLm.train(texts.toDF("text"), "text", vocabSize = 20,
        maxPieceLen = 4, emIters = 2)
      .as[(String, Long, Long)].collect()
      .map { case (p, n, c) => p -> ((n, c)) }.toMap
    val want = naiveTrain(texts, vocabSize = 20, maxPieceLen = 4,
      emIters = 2, maxWordLen = 30)
    assert(got == want)
  }

  test("trainWithLikelihood: per-round corpus cost is monotone " +
      "non-increasing and the vocab equals plain train") {
    val rng = new scala.util.Random(23)
    val alphabet = "abcde"
    val texts = Seq.fill(60)(
      Seq.fill(1 + rng.nextInt(8))(
        Seq.fill(1 + rng.nextInt(7))(
          alphabet(rng.nextInt(alphabet.length))).mkString).mkString(" "))
    val (vocab, ll) = UnigramLm.trainWithLikelihood(texts.toDF("text"),
      "text", vocabSize = 20, maxPieceLen = 4, emIters = 3)
    val rows = ll.orderBy("round")
      .as[(Int, Long, Long)].collect().toSeq
    // one row per model: seed + 3 EM rounds
    assert(rows.map(_._1) == Seq(0, 1, 2, 3))
    // corpus negative log-likelihood must not increase round over round
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2,
        s"round ${b._1} cost ${b._2} > round ${a._1} cost ${a._2}")
    }
    // EM actually learned something on this corpus
    assert(rows.last._2 < rows.head._2)
    assert(rows.forall(_._3 > 0L))
    // observation must not perturb training: same final vocabulary
    val plain = UnigramLm.train(texts.toDF("text"), "text", vocabSize = 20,
        maxPieceLen = 4, emIters = 3)
      .as[(String, Long, Long)].collect().toSet
    assert(vocab.as[(String, Long, Long)].collect().toSet == plain)
  }
}
