package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Pipeline, ReferenceTables}

/** Report engine tests over a finished pipeline job (reference:
  * `pipeline/Report.groovy` semantics + `RowTest` collapse behavior).
  */
class ReportsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-report-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def runFixtureJob(): (Map[String, DataFrame], ReferenceTables) = {
    import spark.implicits._
    val refs = ReferenceTables(
      drugRecommendation = Seq((1L, "drugA", "imp", "take drugA", "strong", "egs"))
        .toDF("id", "drug_name", "implications", "recommendation", "classification", "diplotype_egs"),
      genePhenotypeDrugRecommendation = Seq(("g1", "homozygote normal", 1L))
        .toDF("gene_name", "phenotype_name", "drug_recommendation_id"),
      geneHaplotypeVariant = Seq(
        ("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"),
        ("g1", "*2", "rs3", "C"))
        .toDF("gene_name", "haplotype_name", "snp_id", "allele"),
      genotypePhenotype = Seq(("g1", "*1", "*1", "homozygote normal"))
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "phenotype_name"),
      genotypeDrugRecommendation = Seq(("g1", "*1", "*1", 1L))
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "drug_recommendation_id"))
    val variants = Seq(
      ("patient1", "A", "rs1", "A", "hom"),
      ("patient1", "A", "rs2", "G", "hom"),
      ("patient1", "B", "rs1", "A", "hom"),
      ("patient1", "B", "rs2", "G", "hom"))
      .toDF("patient_id", "physical_chromosome", "snp_id", "allele", "zygosity")
    (Pipeline.runJob(spark, refs, 1L, variants = Some(variants)), refs)
  }

  test("phenotype drug recommendation report: friendly columns + condensed rows") {
    val (stages, refs) = runFixtureJob()
    val report = Reports.phenotypeDrugRecommendationReport(spark, stages, refs, 1L)
    assert(report.columns.toSeq == Seq("SAMPLE_ID", "DRUG_RECOMMENDATION_ID",
      "HET_COMBO", "#HET_COMBOS", "DRUG", "RECOMMENDATION", "GENE", "PHENOTYPE",
      "HAPLOTYPE1", "HAPLOTYPE2", "HAPLOTYPE", "RS#", "ALLELE"))
    val rows = report.collect()
    assert(rows.nonEmpty)
    // First occurrence carries the full context
    val first = rows.head
    assert(first.getString(0) == "patient1")
    assert(first.getString(4) == "drugA")
    assert(first.getString(7) == "homozygote normal")
    // Duplicate suppression: drug name appears exactly once for the patient
    assert(rows.count(r => !r.isNullAt(4)) == 1)
  }

  test("condensed staircase collapse on the report") {
    val (stages, refs) = runFixtureJob()
    val report = Reports.phenotypeDrugRecommendationReport(spark, stages, refs, 1L)
    val collapsed = CondensedJoin.collapseRows(report).toList
    assert(collapsed.nonEmpty)
    // The first collapsed row is dense: drug + phenotype + genotype together
    val first = collapsed.head
    assert(first.contains("DRUG") && first.contains("PHENOTYPE") && first.contains("SAMPLE_ID"))
    // DSV rendering round-trips header + rows
    val dsv = CondensedJoin.toDsv(report.columns.toSeq, collapsed.iterator)
    assert(dsv.linesIterator.next().startsWith("SAMPLE_ID\t"))
    assert(dsv.linesIterator.size == collapsed.size + 1)
  }

  test("genotype drug recommendation report") {
    val (stages, refs) = runFixtureJob()
    val report = Reports.genotypeDrugRecommendationReport(spark, stages, refs, 1L)
    assert(report.columns.toSeq == Seq("SAMPLE_ID", "DRUG_RECOMMENDATION_ID",
      "HET_COMBO", "#HET_COMBOS", "DRUG", "RECOMMENDATION", "GENE",
      "HAPLOTYPE1", "HAPLOTYPE2", "HAPLOTYPE", "RS#", "ALLELE"))
    val rows = report.collect()
    assert(rows.nonEmpty && rows.head.getString(0) == "patient1")
  }

  test("novel haplotype matrix report") {
    import spark.implicits._
    val (_, refs) = runFixtureJob()
    // Job with a novel call: unseen allele at rs1
    val variants = Seq(
      ("patientN", "A", "rs1", "T", "hom"),
      ("patientN", "B", "rs1", "T", "hom"))
      .toDF("patient_id", "physical_chromosome", "snp_id", "allele", "zygosity")
    val stages = Pipeline.runJob(spark, refs, 2L, variants = Some(variants))
    val matrices = Reports.novelHaplotypeReport(spark, stages, refs, 2L)
    assert(matrices.keySet == Set("g1"))
    val m = matrices("g1").collect().map(r => r.getString(0)).toSet
    assert(m.contains("*1") && m.contains("*2"))
    assert(m.exists(_.startsWith("Sample patientN, chrA")))
    assert(m.exists(_.startsWith("Sample patientN, chrB")))
  }
}
