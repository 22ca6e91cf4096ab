package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-table input readers for the stages that accept direct input
  * (reference: `PipelineInput.groovy:15-63` — expected headers per table
  * alias, header optional on the first line, table-specific reader for
  * `variant`).
  */
object PipelineInputs {

  /** Expected headers per direct-input stage alias
    * (`PipelineInput.groovy:15-20`).
    */
  val inputHeaders: Map[String, Seq[String]] = Map(
    "variant" -> VariantReader.rawHeader,
    "genePhenotype" -> Seq("SAMPLE_ID", "GENE", "PHENOTYPE"),
    "genotype" -> Seq("SAMPLE_ID", "GENE", "HAPLOTYPE", "HAPLOTYPE"),
    "geneHaplotype" -> Seq("SAMPLE_ID", "GENE", "HAPLOTYPE"))

  /** Pipeline column names per alias (the header aliases map onto these). */
  val outputColumns: Map[String, Seq[String]] = Map(
    "genePhenotype" -> Seq("patient_id", "gene_name", "phenotype_name"),
    "genotype" -> Seq("patient_id", "gene_name", "haplotype_name1", "haplotype_name2"),
    "geneHaplotype" -> Seq("patient_id", "gene_name", "haplotype_name"))

  /** Read a direct-input file for `tableAlias`: the variant alias explodes
    * allele strings (S2); other aliases read the declared header (optional
    * on line 1) and rename to pipeline column names.
    */
  def read(spark: SparkSession, tableAlias: String, path: String,
      sep: String = "\t"): DataFrame = tableAlias match {
    case "variant" =>
      Dsv.validate(spark, path, VariantReader.rawHeader, sep)
      VariantReader.read(spark, path, sep)
    case alias =>
      val header = inputHeaders.getOrElse(alias,
        throw new IllegalArgumentException(s"no input reader for table $alias"))
      Dsv.validate(spark, path, header, sep)
      val out = outputColumns(alias)
      Dsv.read(spark, path, header, sep).toDF(out: _*)
  }
}
