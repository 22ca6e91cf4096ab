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

  /** Collect + broadcast all per-gene matrices once per session. The
    * per-gene grouping/sorting runs distributed (`groupByKey.mapGroups`) so
    * the driver only assembles pre-built per-gene structures — at the
    * reference's load-test scale (2M matrix rows) the driver-side build was
    * the bottleneck.
    */
  def broadcastMatrices(spark: SparkSession): Broadcast[Map[String, GeneHaplotypeMatrix]] = {
    import spark.implicits._
    // Executors build each gene's dictionary-encoded matrix; the driver only
    // collects the compact form (a few MB at 2M matrix rows) and broadcasts.
    val perGene: Array[(String, Seq[String], Seq[String], Seq[String], Array[Short])] =
      geneHaplotypeVariant
        .select("gene_name", "haplotype_name", "snp_id", "allele")
        .as[(String, String, String, String)]
        .groupByKey(_._1)
        .mapGroups { (gene: String, it: Iterator[(String, String, String, String)]) =>
          val rows = it.map(r => (r._2, r._3, r._4)).toVector
          val snps = rows.map(_._2).distinct.sorted
          val m = GeneHaplotypeMatrix(gene, snps, rows)
          (gene, m.snpIds: Seq[String], m.haplotypes: Seq[String],
            m.alleleDict: Seq[String], m.cells)
        }
        .collect()
    val matrices = perGene.map { case (gene, snps, haps, dict, cells) =>
      gene -> GeneHaplotypeMatrix(gene, snps.toVector, haps.toVector,
        dict.toVector, cells)
    }.toMap
    spark.sparkContext.broadcast(matrices)
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
