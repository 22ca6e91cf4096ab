package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion operator tests (reference: `pipelines.py` collapse_by_key,
  * `process.py` phenotype normalization, `load_dsv.py` FK resolution).
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ingest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("collapseByKey joins distinct non-key values, with field processors") {
    val df = Seq(
      ("g1", "*1", "*2", "poor metabolizers"),
      ("g1", "*1", "*2", "poor metabolizer"),
      ("g1", "*1", "*2", "other")
    ).toDF("gene_name", "haplotype_name1", "haplotype_name2", "phenotype_name")
    val collapsed = Ingest.collapseByKey(df,
      keyCols = Seq("gene_name", "haplotype_name1", "haplotype_name2"),
      fieldProcessors = Map("phenotype_name" -> Ingest.stripTrailingS))
    val row = collapsed.collect().head
    // trailing-'s' variants dedupe to one value ("poor metabolizer")
    assert(row.getString(3) == "other. poor metabolizer")
  }

  test("phenotype normalization strips parentheticals, periods, case") {
    val df = Seq(
      "Intermediate Metabolizer (~2-11% of patients).",
      "Poor  Metabolizer",
      "Ultrarapid metabolizer (~29%)"
    ).toDF("p")
    val got = df.select(Ingest.normalizePhenotypeName($"p"))
      .collect().map(_.getString(0)).toList
    assert(got == List("intermediate metabolizer", "poor metabolizer",
      "ultrarapid metabolizer"))
  }

  test("FK resolution assigns deterministic ids and resolves children") {
    val parent = Seq("drugB", "drugA", "drugB").toDF("drug_name")
    val child = Seq(("r1", "drugA"), ("r2", "drugB")).toDF("rec", "drug_name")
    val (withId, resolved) = Ingest.resolveForeignKeys(parent, child,
      Seq("drug_name"), "drug_recommendation_id")
    assert(withId.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("drugA", 1L), ("drugB", 2L)))
    assert(resolved.select("rec", "drug_recommendation_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("r1", 1L), ("r2", 2L)))
  }
}
