package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.broadcast.Broadcast
import graft.algo.GeneHaplotypeMatrix

/** The 6 reference/lookup tables the pipeline joins against, plus the derived
  * `gene_snp`/`gene_haplotype` views (reference defines them as
  * `select distinct` MERGE views, `haplorec.sql.jinja:59-76`) and the
  * broadcast gene–haplotype matrices.
  *
  * These tables are small (largest real gene matrix is 133×151,
  * `todo.txt:321-323`), so the haplotype-calling matrices are collected once
  * and broadcast — replacing the reference's per-(gene,patient) SQL round
  * trips (`Pipeline.groovy:230-316`) with executor-local map lookups.
  */
final class ReferenceTables(
    val drugRecommendation: DataFrame,
    val genePhenotypeDrugRecommendation: DataFrame,
    val geneHaplotypeVariant: DataFrame,
    val genotypePhenotype: DataFrame,
    val genotypeDrugRecommendation: DataFrame
) extends Serializable {

  /** `gene_snp` view: distinct (gene_name, snp_id) (`haplorec.sql.jinja:59-67`). */
  lazy val geneSnp: DataFrame =
    geneHaplotypeVariant.select("gene_name", "snp_id").distinct()

  /** `gene_haplotype` view (`haplorec.sql.jinja:69-76`). */
  lazy val geneHaplotype: DataFrame =
    geneHaplotypeVariant.select("gene_name", "haplotype_name").distinct()

  /** Collect + broadcast all per-gene matrices once per session. */
  def broadcastMatrices(spark: SparkSession): Broadcast[Map[String, GeneHaplotypeMatrix]] = {
    val rows = geneHaplotypeVariant
      .select("gene_name", "haplotype_name", "snp_id", "allele")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    spark.sparkContext.broadcast(GeneHaplotypeMatrix.fromLongRows(rows))
  }
}

object ReferenceTables {
  def apply(
      drugRecommendation: DataFrame,
      genePhenotypeDrugRecommendation: DataFrame,
      geneHaplotypeVariant: DataFrame,
      genotypePhenotype: DataFrame,
      genotypeDrugRecommendation: DataFrame): ReferenceTables =
    new ReferenceTables(
      drugRecommendation,
      genePhenotypeDrugRecommendation,
      geneHaplotypeVariant,
      genotypePhenotype,
      genotypeDrugRecommendation)
}
