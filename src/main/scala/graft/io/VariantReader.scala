package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed variant-file reader: projects 3 of the 9 raw columns and explodes
  * each line into 1–2 variant rows.
  *
  * Reference semantics
  * (`/root/reference/src/groovy/haplorec/util/pipeline/PipelineInput.groovy:71-123`):
  *  - 2-char allele string  ⇒ two `'het'` rows (null chromosome);
  *  - 1-char                ⇒ two `'hom'` rows on chromosomes A and B;
  *  - empty                 ⇒ one row with null chromosome/allele/zygosity;
  *  - ≥3 chars (e.g. `CAT`) ⇒ treated `'hom'` on A and B.
  *
  * Re-expressed as an `explode` over a computed array of structs — a
  * Generator inside whole-stage codegen, no JVM closure in the hot path
  * (the reference's row-exploding iterator is driver-side and sequential).
  */
object VariantReader {

  val rawHeader: Seq[String] = Seq("PLATE", "EXPERIMENT", "CHIP",
    "WELL_POSITION", "ASSAY_ID", "GENOTYPE_ID", "DESCRIPTION", "SAMPLE_ID",
    "ENTRY_OPERATOR")

  /** Read a 9-column variant file (header optional) into exploded variant
    * rows `(patient_id, physical_chromosome, snp_id, allele, zygosity)`.
    */
  def read(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    explodeVariants(Dsv.read(spark, path, rawHeader, sep,
      fields = Seq("ASSAY_ID", "GENOTYPE_ID", "SAMPLE_ID")))

  /** Explode raw `(ASSAY_ID, GENOTYPE_ID, SAMPLE_ID)` rows into variant rows. */
  def explodeVariants(raw: DataFrame): DataFrame = {
    val alleles = coalesce(col("GENOTYPE_ID"), lit(""))
    def vrow(chrom: Column, allele: Column, zyg: Column): Column =
      struct(chrom.cast("string").as("physical_chromosome"),
        allele.cast("string").as("allele"), zyg.cast("string").as("zygosity"))
    val nullS = lit(null).cast("string")
    val rows = when(length(alleles) === 2, array(
        vrow(nullS, substring(alleles, 1, 1), lit("het")),
        vrow(nullS, substring(alleles, 2, 1), lit("het"))))
      .when(length(alleles) === 1, array(
        vrow(lit("A"), alleles, lit("hom")),
        vrow(lit("B"), alleles, lit("hom"))))
      .when(length(alleles) === 0, array(vrow(nullS, nullS, nullS)))
      .otherwise(array(
        vrow(lit("A"), alleles, lit("hom")),
        vrow(lit("B"), alleles, lit("hom"))))
    raw
      .select(col("SAMPLE_ID").as("patient_id"), col("ASSAY_ID").as("snp_id"),
        explode(rows).as("v"))
      .select(col("patient_id"), col("v.physical_chromosome"), col("snp_id"),
        col("v.allele"), col("v.zygosity"))
  }
}
