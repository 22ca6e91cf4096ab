package graft.examples

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, ReferenceTables}

/** Runnable end-to-end example: the reference's "unambiguous drug
  * recommendation" scenario
  * (`/root/reference/test/groovy/haplorec/test/util/pipeline/PipelineTest.groovy:260-314`)
  * driven through the public pipeline API. One patient's hom variants resolve
  * to a (*1, *1) genotype, a 'homozygote normal' phenotype, and drug
  * recommendation 1.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val refs = ReferenceTables(
      drugRecommendation = Seq(
        (1L, "drug"), (2L, "some drug"), (3L, "no drug")
      ).toDF("id", "recommendation"),
      genePhenotypeDrugRecommendation = Seq(
        ("g1", "homozygote normal", 1L),
        ("g1", "heterozygote", 2L),
        ("g1", "nonfunctional", 3L)
      ).toDF("gene_name", "phenotype_name", "drug_recommendation_id"),
      geneHaplotypeVariant = Seq(
        ("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"),
        ("g1", "*2", "rs3", "C"), ("g1", "*2", "rs4", "T")
      ).toDF("gene_name", "haplotype_name", "snp_id", "allele"),
      genotypePhenotype = Seq(
        ("g1", "*1", "*1", "homozygote normal"),
        ("g1", "*1", "*2", "heterozygote"),
        ("g1", "*2", "*2", "nonfunctional")
      ).toDF("gene_name", "haplotype_name1", "haplotype_name2", "phenotype_name"),
      genotypeDrugRecommendation = Seq.empty[(String, String, String, Long)]
        .toDF("gene_name", "haplotype_name1", "haplotype_name2", "drug_recommendation_id"))

    val variants = Seq(
      ("patient1", "A", "rs1", "A", "hom"),
      ("patient1", "A", "rs2", "G", "hom"),
      ("patient1", "B", "rs1", "A", "hom"),
      ("patient1", "B", "rs2", "G", "hom")
    ).toDF("patient_id", "physical_chromosome", "snp_id", "allele", "zygosity")

    val stages = Pipeline.runJob(spark, refs, jobId = 1L, variants = Some(variants))

    Seq("geneHaplotype", "genotype", "genePhenotype",
      "phenotypeDrugRecommendation", "genotypeDrugRecommendation",
      "novelHaplotype").foreach { name =>
      stages.get(name).foreach { df =>
        println(s"=== $name ===")
        df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*).show(false)
      }
    }
    spark.stop()
  }
}
