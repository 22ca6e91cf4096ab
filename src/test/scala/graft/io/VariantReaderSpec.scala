package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Variant-file reader tests: explode semantics
  * (`PipelineInput.groovy:88-119`) plus the reference's real 2-sample file
  * (`/root/reference/test/in/2_samples.txt`).
  */
class VariantReaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-io-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def explode(rows: (String, String, String)*): Set[(String, Option[String], String, Option[String], Option[String])] =
    VariantReader.explodeVariants(
      rows.toSeq.toDF("ASSAY_ID", "GENOTYPE_ID", "SAMPLE_ID"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
      .toSet

  test("1-char allele => two hom rows on A and B") {
    assert(explode(("rs1", "C", "p1")) == Set(
      ("p1", Some("A"), "rs1", Some("C"), Some("hom")),
      ("p1", Some("B"), "rs1", Some("C"), Some("hom"))))
  }

  test("2-char allele => two het rows with null chromosome") {
    assert(explode(("rs1", "TC", "p1")) == Set(
      ("p1", None, "rs1", Some("T"), Some("het")),
      ("p1", None, "rs1", Some("C"), Some("het"))))
  }

  test("empty allele => one fully-null call row") {
    assert(explode(("rs1", "", "p1")) == Set(
      ("p1", None, "rs1", None, None)))
  }

  test(">=3-char allele => treated hom on A and B") {
    assert(explode(("rs1", "CAT", "p1")) == Set(
      ("p1", Some("A"), "rs1", Some("CAT"), Some("hom")),
      ("p1", Some("B"), "rs1", Some("CAT"), Some("hom"))))
  }

  test("reads the reference 2_samples.txt file") {
    val df = VariantReader.read(spark, "/root/reference/test/in/2_samples.txt")
    val rows = df.collect()
    // 47 data lines, each exploding to 1 or 2 rows; 2 samples
    assert(df.columns.toSeq == Seq("patient_id", "physical_chromosome",
      "snp_id", "allele", "zygosity"))
    assert(rows.map(_.getString(0)).toSet.size == 2)
    assert(rows.length > 47)
    // a hom line yields two rows
    val hom = rows.filter(r => r.getString(4) == "hom")
    assert(hom.nonEmpty && hom.length % 2 == 0)
  }
}
