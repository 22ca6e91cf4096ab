package graft.pipeline

import org.apache.spark.sql.types._

/** Typed row models + StructTypes for the 6 reference tables and 8 stage
  * tables. Reference DDL: `/root/reference/src/sql/mysql/haplorec.sql.jinja:24-219`.
  * All domain values are strings/ints (the reference has no other types);
  * `physical_chromosome` ∈ {"A","B"}, `zygosity` ∈ {"het","hom"}.
  */
object Schemas {

  // ---- stage-table row models (job-scoped; job_id is a plain column) ----

  /** `job_patient_variant` (`haplorec.sql.jinja:197-205`). */
  case class VariantRow(
      job_id: Long,
      patient_id: String,
      physical_chromosome: Option[String],
      snp_id: String,
      allele: Option[String],
      zygosity: Option[String])

  /** `job_patient_het_variant` (`haplorec.sql.jinja:207-213`). */
  case class HetVariantRow(
      job_id: Long,
      patient_id: String,
      physical_chromosome: String,
      het_combo: Int,
      het_combos: Int,
      snp_id: String,
      allele: String)

  /** One haplotype-calling result; `haplotype_name = None` marks a novel
    * haplotype (split into `job_patient_gene_haplotype` /
    * `job_patient_novel_haplotype` downstream).
    */
  case class HaplotypeCall(
      job_id: Long,
      patient_id: String,
      physical_chromosome: String,
      het_combo: Int,
      het_combos: Int,
      gene_name: String,
      haplotype_name: Option[String])

  /** Input rows for the het-disambiguation group: hom variants (from
    * `variant`) and phased het variants (from `het_variant`) tagged and
    * co-grouped per (job, patient, gene).
    */
  case class TaggedVariant(
      job_id: Long,
      patient_id: String,
      gene_name: String,
      physical_chromosome: Option[String],
      het_combo: Int,
      het_combos: Int,
      snp_id: String,
      allele: String,
      is_het: Boolean)

  /** Bare het call fed to disambiguation. */
  case class HetCall(
      job_id: Long,
      patient_id: String,
      gene_name: String,
      snp_id: String,
      allele: String)

  // ---- reference-table schemas (for CSV/parquet ingest) ----

  val drugRecommendation: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("drug_name", StringType),
    StructField("implications", StringType),
    StructField("recommendation", StringType),
    StructField("classification", StringType),
    StructField("diplotype_egs", StringType)))

  val genePhenotypeDrugRecommendation: StructType = StructType(Seq(
    StructField("gene_name", StringType),
    StructField("phenotype_name", StringType),
    StructField("drug_recommendation_id", LongType)))

  val geneHaplotypeVariant: StructType = StructType(Seq(
    StructField("gene_name", StringType),
    StructField("haplotype_name", StringType),
    StructField("snp_id", StringType),
    StructField("allele", StringType)))

  val genotypePhenotype: StructType = StructType(Seq(
    StructField("gene_name", StringType),
    StructField("haplotype_name1", StringType),
    StructField("haplotype_name2", StringType),
    StructField("phenotype_name", StringType)))

  val genotypeDrugRecommendation: StructType = StructType(Seq(
    StructField("gene_name", StringType),
    StructField("haplotype_name1", StringType),
    StructField("haplotype_name2", StringType),
    StructField("drug_recommendation_id", LongType)))

  val variant: StructType = StructType(Seq(
    StructField("job_id", LongType, nullable = false),
    StructField("patient_id", StringType, nullable = false),
    StructField("physical_chromosome", StringType),
    StructField("snp_id", StringType, nullable = false),
    StructField("allele", StringType),
    StructField("zygosity", StringType)))

  /** Stage-table alias -> canonical table name
    * (`Pipeline.groovy:25-49` table-alias indirection).
    */
  val defaultTables: Map[String, String] = Map(
    "variant" -> "job_patient_variant",
    "hetVariant" -> "job_patient_het_variant",
    "geneHaplotype" -> "job_patient_gene_haplotype",
    "novelHaplotype" -> "job_patient_novel_haplotype",
    "genotype" -> "job_patient_genotype",
    "genePhenotype" -> "job_patient_gene_phenotype",
    "genotypeDrugRecommendation" -> "job_patient_genotype_drug_recommendation",
    "phenotypeDrugRecommendation" -> "job_patient_phenotype_drug_recommendation")
}
