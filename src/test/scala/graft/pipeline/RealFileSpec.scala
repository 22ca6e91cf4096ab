package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real-input-file scenarios: the reference's 2-sample variant file through
  * the full pipeline (`PipelineTest.groovy:212-258`) and invalid-input
  * handling (`:422-503`).
  */
class RealFileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-realfile-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def refs: ReferenceTables = {
    import spark.implicits._
    ReferenceTables(
      Seq((1L, "drug"), (2L, "some drug"), (3L, "no drug")).toDF("id", "recommendation"),
      Seq(("g1", "homozygote normal", 1L), ("g1", "heterozygote", 2L),
        ("g1", "nonfunctional", 3L))
        .toDF("gene_name", "phenotype_name", "drug_recommendation_id"),
      Seq(("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"),
        ("g1", "*2", "rs3", "C"), ("g1", "*2", "rs4", "T"))
        .toDF("gene_name", "haplotype_name", "snp_id", "allele"),
      Seq(("g1", "*1", "*1", "homozygote normal"), ("g1", "*1", "*2", "heterozygote"),
        ("g1", "*2", "*2", "nonfunctional"))
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "phenotype_name"),
      Seq.empty[(String, String, String, Long)]
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "drug_recommendation_id"))
  }

  test("real 2_samples.txt file runs the whole pipeline (PipelineTest:212-258)") {
    val variants = graft.io.PipelineInputs.read(spark, "variant",
      "/root/reference/test/in/2_samples.txt")
    val stages = Pipeline.runJob(spark, refs, 1L, variants = Some(variants))
    // 47 data lines explode into 1-2 rows each; both samples land in the table
    val v = stages("variant")
    assert(v.count() > 47)
    assert(v.select("patient_id").distinct().count() == 2)
    // the file's snps don't belong to g1's matrix => no calls, no failures
    assert(stages("geneHaplotype").count() == 0)
  }

  test("invalid variant input: truncated line raises InvalidInputException (PipelineTest:484-503)") {
    val f = java.nio.file.Files.createTempFile("bad_variants", ".txt")
    java.nio.file.Files.writeString(f,
      Seq(
        graft.io.VariantReader.rawHeader.mkString("\t"),
        Seq("PLATE", "1", "1", "N02", "chr1_117098850", "CA", "A.Conservative", "1063-117507", "Automatic").mkString("\t"),
        "PLATE\t1", // truncated
        Seq("PLATE", "1", "1", "N02", "chr22_35868467", "CA", "A.Conservative", "1063-117507", "Automatic").mkString("\t")
      ).mkString("\n"))
    val e = intercept[graft.io.Dsv.InvalidInputException] {
      graft.io.PipelineInputs.read(spark, "variant", f.toString)
    }
    assert(e.getMessage.matches("Expected \\d+ columns matching header.*"))
  }

  test("invalid genotype input: too few columns (PipelineTest:461-471)") {
    val f = java.nio.file.Files.createTempFile("bad_genotypes", ".tsv")
    java.nio.file.Files.writeString(f, "patient1\tg1\t*1\n")
    val e = intercept[graft.io.Dsv.InvalidInputException] {
      graft.io.PipelineInputs.read(spark, "genotype", f.toString)
    }
    assert(e.getMessage.matches("Expected \\d+ columns matching header.*"))
  }
}
