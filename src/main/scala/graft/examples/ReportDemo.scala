package graft.examples

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, ReferenceTables}
import graft.report.{CondensedJoin, Reports}

/** Drives the condensed-report engine end-to-end: full pipeline run, then the
  * phenotype drug-recommendation report rendered as the reference's condensed
  * DSV.
  */
object ReportDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val refs = ReferenceTables(
      Seq((1L, "drugA", "imp", "take drugA", "strong", "egs"))
        .toDF("id", "drug_name", "implications", "recommendation", "classification", "diplotype_egs"),
      Seq(("g1", "homozygote normal", 1L))
        .toDF("gene_name", "phenotype_name", "drug_recommendation_id"),
      Seq(("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"))
        .toDF("gene_name", "haplotype_name", "snp_id", "allele"),
      Seq(("g1", "*1", "*1", "homozygote normal"))
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "phenotype_name"),
      Seq.empty[(String, String, String, Long)]
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "drug_recommendation_id"))
    val variants = Seq(
      ("patient1", "A", "rs1", "A", "hom"), ("patient1", "A", "rs2", "G", "hom"),
      ("patient1", "B", "rs1", "A", "hom"), ("patient1", "B", "rs2", "G", "hom"),
      ("patient2", "A", "rs1", "A", "hom"), ("patient2", "A", "rs2", "G", "hom"),
      ("patient2", "B", "rs1", "A", "hom"), ("patient2", "B", "rs2", "G", "hom"))
      .toDF("patient_id", "physical_chromosome", "snp_id", "allele", "zygosity")
    val stages = Pipeline.runJob(spark, refs, 1L, variants = Some(variants))
    val report = Reports.phenotypeDrugRecommendationReport(spark, stages, refs, 1L)
    println("=== condensed phenotype drug recommendation report (DSV) ===")
    print(CondensedJoin.toDsv(report.columns.toSeq, CondensedJoin.collapseRows(report)))
    spark.stop()
  }
}
