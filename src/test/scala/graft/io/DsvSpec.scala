package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSV reader parity with the reference's `Input.dsv`
  * (`Input.groovy:46-140`): regex separators, field projection by name and
  * by 1-based index, header detection/skip/require, bad-line handling.
  */
class DsvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsv-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpFile(lines: Seq[String], suffix: String = ".txt"): String = {
    val f = java.nio.file.Files.createTempFile("dsv", suffix)
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("readRegex splits by a regex separator (Input.groovy:57,86)") {
    val p = tmpFile(Seq("a , b,c", "1,2 , 3"))
    val got = Dsv.readRegex(spark, p, sepRegex = "\\s*,\\s*",
        header = Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSet == Set(("a", "b", "c"), ("1", "2", "3")))
  }

  test("readRegex detects and skips a header line when present") {
    val p = tmpFile(Seq("x\ty\tz", "1\t2\t3"))
    val got = Dsv.readRegex(spark, p, header = Seq("x", "y", "z")).collect()
    assert(got.length == 1 && got(0).getString(0) == "1")
    // same file, separator as the reference's default regex form
    val noHeader = tmpFile(Seq("1\t2\t3", "4\t5\t6"))
    assert(Dsv.readRegex(spark, noHeader, header = Seq("x", "y", "z")).count() == 2)
  }

  test("readRegex requireHeader raises the reference's message (Input.groovy:98)") {
    val p = tmpFile(Seq("1\t2\t3"))
    val e = intercept[Dsv.InvalidInputException] {
      Dsv.readRegex(spark, p, header = Seq("x", "y", "z"), requireHeader = true)
    }
    assert(e.getMessage.startsWith("Expected header line"))
  }

  test("readRegex 1-based index projection without a header (Input.groovy:63-64)") {
    val p = tmpFile(Seq("a\tb\tc\td", "e\tf\tg\th"))
    val df = Dsv.readRegex(spark, p, fieldIndices = Seq(3, 1))
    assert(df.columns.toSeq == Seq("_c3", "_c1"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c", "a"), ("g", "e")))
  }

  test("readRegex projection by header name (Input.groovy:67-76)") {
    val p = tmpFile(Seq("1\t2\t3"))
    val df = Dsv.readRegex(spark, p, header = Seq("x", "y", "z"),
      fields = Seq("z", "x"))
    assert(df.columns.toSeq == Seq("z", "x"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("3", "1")))
    val e = intercept[IllegalArgumentException] {
      Dsv.readRegex(spark, p, header = Seq("x"), fields = Seq("nope"))
    }
    assert(e.getMessage.contains("no such field"))
  }

  test("readRegex skipHeader drops line 1 unconditionally (Input.groovy:99-104)") {
    val p = tmpFile(Seq("not\ta\theader", "1\t2\t3"))
    val got = Dsv.readRegex(spark, p, header = Seq("x", "y", "z"),
      skipHeader = true).collect()
    assert(got.length == 1 && got(0).getString(0) == "1")
  }

  test("readRegex too-short line raises the reference's message (Input.groovy:115-121)") {
    val p = tmpFile(Seq("1\t2\t3", "1\t2"))
    val e = intercept[Exception] {
      Dsv.readRegex(spark, p, header = Seq("x", "y", "z")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(e).exists(_.contains("Expected 3 columns matching header")))
    // tolerant mode drops the bad line instead
    assert(Dsv.readRegex(spark, p, header = Seq("x", "y", "z"),
      failOnBadLine = false).count() == 1)
  }

  test("read with fieldIndices projects the literal-sep fast path") {
    val p = tmpFile(Seq("a\tb\tc", "d\te\tf"))
    val df = Dsv.read(spark, p, header = Seq("x", "y", "z"), fieldIndices = Seq(2))
    assert(df.columns.toSeq == Seq("y"))
    assert(df.collect().map(_.getString(0)).toSet == Set("b", "e"))
  }

  test("first-line probe works through the Hadoop FS API on a directory") {
    val dir = graft.TestScratch.path("dsvdir")
    java.nio.file.Files.writeString(dir.resolve("part-000.txt"), "x\ty\n1\t2")
    val got = Dsv.read(spark, dir.toString, header = Seq("x", "y")).collect()
    assert(got.length == 1 && got(0).getString(0) == "1")
  }

  test("dsvLine keeps null field positions with '' encoding (Row.groovy:235-305)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", Some("b"), 1), ("x", None, 2)).toDF("c1", "c2", "c3")
    val got = df.select(DsvWriter.dsvLine(
        Seq(col("c1"), col("c2"), col("c3")), sep = "|").as("l"))
      .collect().map(_.getString(0)).toSet
    // A plain concat_ws would render the null row as "x|2" — field shift.
    assert(got == Set("a|b|1", "x||2"))
  }
}
