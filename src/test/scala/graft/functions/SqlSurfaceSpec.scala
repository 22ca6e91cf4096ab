package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The registered SQL surface (GraftFunctions.register): every function
  * callable from `spark.sql` must return exactly what its Column-API
  * twin returns — the deployment path where users bring their own SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sql-surface-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  lazy val ready: Unit = {
    GraftFunctions.register(spark)
    Seq(
      (1L, "The quick brown fox, JUMPS over the lazy dog today!",
        Seq(1.0f, 0.0f)),
      (2L, "el la de que los una por con para es si bien",
        Seq(0.6f, 0.8f)),
      (3L, "", Seq(0.0f, 1.0f)))
      .toDF("id", "text", "vec")
      .createOrReplaceTempView("sql_docs")
  }

  private def one(sqlExpr: String, colExpr: org.apache.spark.sql.Column,
      id: Long = 1L): Unit = {
    ready
    val viaSql = spark.sql(
      s"SELECT $sqlExpr AS v FROM sql_docs WHERE id = $id").collect().head
    val viaCol = spark.table("sql_docs").filter(col("id") === id)
      .select(colExpr.as("v")).collect().head
    assert(viaSql == viaCol, s"$sqlExpr: sql=$viaSql column=$viaCol")
  }

  test("tokens ≡ TextFunctions.tokens") {
    one("tokens(text)", TextFunctions.tokens(col("text")))
    // empty text → empty array, not null tokens
    one("size(tokens(text))", size(TextFunctions.tokens(col("text"))), id = 3L)
  }

  test("quality_score ≡ TextFunctions.qualityScore") {
    one("quality_score(text)", TextFunctions.qualityScore(col("text")))
    one("quality_score(text)", TextFunctions.qualityScore(col("text")), id = 2L)
  }

  test("char_bigram_entropy ≡ HashExpressions.charBigramEntropy") {
    one("char_bigram_entropy(lower(text))",
      HashExpressions.charBigramEntropy(lower(col("text"))))
    // sub-2-char input yields NULL through both surfaces
    one("char_bigram_entropy(lower(text))",
      HashExpressions.charBigramEntropy(lower(col("text"))), id = 3L)
  }

  test("nearest_centroid ≡ NearestCentroid.assign, any literal " +
      "numeric types, order-independent ties") {
    ready
    val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val viaCol = spark.table("sql_docs")
      .select(col("id"), NearestCentroid.assign(col("vec"), cents).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int ids + decimal-literal components exercise the registration
    // casts; ids deliberately out of order (sorted at registration)
    val viaSql = spark.sql(
      """SELECT id, nearest_centroid(vec, array(1, 0),
           array(array(0.0, 1.0), array(1.0, 0.0))) AS c
         FROM sql_docs""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaCol)
    assert(viaSql == Set((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("the original eight registrations stay callable") {
    ready
    val r = spark.sql(
      """SELECT vec_dot(vec, vec) AS d,
                minhash_sig(shingle_set(text, 2), 4)[0] AS mh,
                simhash64(tokens(text)) AS sh,
                size(ngram_set(lower(text), 3)) AS ng,
                unicode_normalize(text, 'NFKC') AS un,
                url_host(url_canonicalize('HTTP://Ex.COM/a?utm_source=x'))
                  AS host
         FROM sql_docs WHERE id = 1""").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(!r.isNullAt(1) && !r.isNullAt(2) && r.getInt(3) > 0)
    assert(r.getString(4).nonEmpty && r.getString(5) == "ex.com")
  }

  test("nearest_centroid rejects a non-literal centroid table") {
    ready
    val err = intercept[Exception] {
      spark.sql(
        """SELECT nearest_centroid(vec, array(id), array(vec)) FROM sql_docs"""
      ).collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("nearest_centroid rejects NULL/non-numeric ids and NULL vector " +
      "components instead of silently mapping them to 0") {
    ready
    // NULL id literal: would unbox to centroid id 0
    val nullId = intercept[Exception] {
      spark.sql(
        """SELECT nearest_centroid(vec, array(7, CAST(NULL AS BIGINT)),
          |array(array(1.0, 0.0), array(0.0, 1.0))) FROM sql_docs"""
          .stripMargin).collect()
    }
    assert(nullId.getMessage.contains("NULL"))
    // non-numeric ids cast to all-NULL: same rejection, not all-zero ids
    val strIds = intercept[Exception] {
      spark.sql(
        """SELECT nearest_centroid(vec, array('a', 'b'),
          |array(array(1.0, 0.0), array(0.0, 1.0))) FROM sql_docs"""
          .stripMargin).collect()
    }
    assert(strIds.getMessage.contains("NULL"))
    // a NULL inner vector: clear message, not a raw NPE
    val nullVec = intercept[Exception] {
      spark.sql(
        """SELECT nearest_centroid(vec, array(1, 2),
          |array(array(1.0, 0.0), NULL)) FROM sql_docs"""
          .stripMargin).collect()
    }
    assert(nullVec.getMessage.contains("NULL"))
    // a NULL component inside a vector: toDoubleArray would read 0.0
    val nullComp = intercept[Exception] {
      spark.sql(
        """SELECT nearest_centroid(vec, array(1, 2),
          |array(array(1.0, 0.0), array(CAST(NULL AS DOUBLE), 1.0)))
          |FROM sql_docs""".stripMargin).collect()
    }
    assert(nullComp.getMessage.contains("NULL"))
  }

  test("custom expressions reject wrong input types at ANALYSIS time, " +
      "not with a runtime ClassCastException or codegen compile error") {
    ready
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1L, 42L)).toDF("id", "n")
    // string-typed unaries fed a bigint
    for (expr <- Seq(
        HashExpressions.repetitionStats(col("n"), "\n"),
        HashExpressions.shingleSet(col("n"), 3),
        HashExpressions.ngramSet(col("n"), 2),
        UrlExpressions.urlParts(col("n")),
        UrlExpressions.urlCanonicalize(col("n")),
        UrlExpressions.urlHost(col("n")))) {
      val e = intercept[AnalysisException] { df.select(expr).collect() }
      assert(e.getMessage.toLowerCase.contains("type"),
        s"expected a type-check analysis error, got: ${e.getMessage}")
    }
    // array<string>-typed unaries fed a bigint
    for (expr <- Seq(
        HashExpressions.minHashSig(col("n"), 4),
        HashExpressions.simHash64(col("n")))) {
      val e = intercept[AnalysisException] { df.select(expr).collect() }
      assert(e.getMessage.toLowerCase.contains("type"),
        s"expected a type-check analysis error, got: ${e.getMessage}")
    }
  }
}
