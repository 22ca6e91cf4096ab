package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Generic delimiter-separated reader.
  *
  * Reference semantics (`/root/reference/src/groovy/haplorec/util/Input.groovy:46-140`):
  * configurable separator; an optional expected header whose presence is
  * detected on the first line (skip it if present, or fail when
  * `requireHeader`); projection of a subset of fields by header name; bad
  * lines (wrong column count) rejected.
  *
  * The fast path is Spark's native CSV scan (distributed, pushdown-friendly);
  * only the first-line header probe touches the driver (O(1)).
  */
object Dsv {

  final case class InvalidInputException(msg: String) extends RuntimeException(msg)

  /** Read `path` as DSV with columns named by `header`.
    *
    * @param header        expected column names, in order
    * @param sep           field separator (default tab)
    * @param requireHeader fail unless line 1 equals the header
    * @param fields        project to these columns (default: all)
    * @param failOnBadLine reject lines whose column count differs
    */
  def read(
      spark: SparkSession,
      path: String,
      header: Seq[String],
      sep: String = "\t",
      requireHeader: Boolean = false,
      fields: Seq[String] = Nil,
      failOnBadLine: Boolean = true
  ): DataFrame = {
    val firstLine = firstLineOf(spark, path)
    val headerLine = header.mkString(sep)
    val hasHeader = firstLine.contains(headerLine)
    if (requireHeader && !hasHeader)
      throw InvalidInputException(
        s"expected header '$headerLine' as first line of $path, saw '${firstLine.getOrElse("")}'")

    // Duplicate header names (the reference's genotype header repeats
    // HAPLOTYPE) are uniquified for the schema; detection above used the
    // raw names.
    val seen = scala.collection.mutable.Map[String, Int]()
    val uniqueNames = header.map { h =>
      val n = seen.getOrElse(h, 0)
      seen(h) = n + 1
      if (n == 0) h else s"$h$n"
    }
    val schema = StructType(uniqueNames.map(StructField(_, StringType)))
    val df = spark.read
      .option("sep", sep)
      .option("header", hasHeader.toString)
      .option("mode", if (failOnBadLine) "FAILFAST" else "DROPMALFORMED")
      .option("enforceSchema", "true")
      .schema(schema)
      .csv(path)
    if (fields.nonEmpty) df.select(fields.map(col): _*) else df
  }

  /** Eagerly validate per-line column counts, raising the reference's
    * `InvalidInputException` (`Input.groovy:107-118` — "Expected N columns
    * matching header ...") instead of a deferred task failure. One
    * distributed pass over the raw lines.
    */
  def validate(spark: SparkSession, path: String, header: Seq[String],
      sep: String = "\t"): Unit = {
    import spark.implicits._
    val n = header.size
    val sepRegex = java.util.regex.Pattern.quote(sep)
    val bad = spark.read.textFile(path)
      .filter(line => line.nonEmpty && line.split(sepRegex, -1).length != n)
      .take(1)
    bad.headOption.foreach { line =>
      throw InvalidInputException(
        s"Expected $n columns matching header ${header.mkString(", ")}, but saw line: $line")
    }
  }

  private def firstLineOf(spark: SparkSession, path: String): Option[String] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().nextOption()
    finally src.close()
  }
}
