package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Span-corruption example construction: hand case plus a randomized
  * differential test against a naive in-memory construction.
  */
class SpanCorruptionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-span-corruption-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def naive(id: Long, text: String, b: Int, maskNum: Int,
      maxSpan: Int): (Long, Long, String, String) = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val blocks = t.grouped(b).toSeq.zipWithIndex
    var nMasked = 0L
    val inp = new StringBuilder
    val tgt = new StringBuilder
    def app(sb: StringBuilder, w: String): Unit = {
      if (sb.nonEmpty) sb.append(' '); sb.append(w)
    }
    blocks.foreach { case (bt, bi) =>
      val h = java.lang.Long.parseLong(md5hex(s"$id:$bi").substring(0, 4), 16)
      val masked = h % 4096 < maskNum
      val span = (1 + (h / 4096) % maxSpan).toInt
      if (masked) {
        val sent = s"<extra_id_$bi>"
        app(inp, sent)
        bt.drop(span).foreach(app(inp, _))
        app(tgt, sent)
        bt.take(span).foreach(app(tgt, _))
        nMasked += math.min(span, bt.size)
      } else bt.foreach(app(inp, _))
    }
    (t.size.toLong, nMasked, inp.toString, tgt.toString)
  }

  test("hand case: forced full masking corrupts every block") {
    // maskNum = 4096 -> every block masks; maxSpan = 1 -> one token each.
    val got = Curation.spanCorruption(
        Seq((7L, "a b c d e")).toDF("doc_id", "text"),
        "doc_id", "text", blockSize = 2, maskNum = 4096, maxSpan = 1)
      .collect().head
    assert(got.getLong(1) == 5L)
    assert(got.getLong(2) == 3L) // blocks (a b)(c d)(e), 1 masked each
    assert(got.getString(3) == "<extra_id_0> b <extra_id_1> d <extra_id_2>")
    assert(got.getString(4) == "<extra_id_0> a <extra_id_1> c <extra_id_2> e")
  }

  test("empty and sub-block documents survive") {
    val got = Curation.spanCorruption(
        Seq((1L, ""), (2L, "solo")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got(1L) == ((0L, 0L, "", "")))
    val (nt, nm, inp, tgt) = got(2L)
    assert(nt == 1L && (inp.nonEmpty || tgt.nonEmpty))
    assert(nm <= 1L)
  }

  test("spanCorruption ≡ naive block-stratified construction (randomized)") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 30L).map { i =>
        (i, List.fill(rnd.nextInt(20))("w" + rnd.nextInt(50)).mkString(" "))
      }
      val got = Curation.spanCorruption(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
        .toMap
      docs.foreach { case (id, text) =>
        assert(got(id) == naive(id, text, 4, 1024, 3), s"doc $id '$text'")
      }
    }
  }
}
