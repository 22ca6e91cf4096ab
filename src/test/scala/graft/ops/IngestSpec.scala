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

  test("map DSL parses the reference's own scrapy_config.mk strings") {
    // The exact --map string from /root/reference/scrapy_config.mk:27.
    val m = Ingest.parseMapDsl(
      "genotype_drug_recommendation: gene_name, haplotype_name1, haplotype_name2, drug_name => drug_recommendation")
    assert(m == Ingest.FkMapping(
      "genotype_drug_recommendation",
      Seq("gene_name", "haplotype_name1", "haplotype_name2", "drug_name"),
      "drug_recommendation"))
    // The --ignore strings from scrapy_config.mk:29-35.
    assert(Ingest.parseIgnoreDsl("genotype_drug_recommendation.drug_name") ==
      (("genotype_drug_recommendation", "drug_name")))
    assert(Ingest.parseIgnoreDsl("drug_recommendation.gene_name") ==
      (("drug_recommendation", "gene_name")))
    // Trailing comma tolerated (load_dsv.py's own docstring example).
    assert(Ingest.parseMapDsl("R_1: x, => T") ==
      Ingest.FkMapping("R_1", Seq("x"), "T"))
    intercept[IllegalArgumentException](Ingest.parseMapDsl("R_1 x => T"))
    intercept[IllegalArgumentException](Ingest.parseMapDsl("R_1: => T"))
    intercept[IllegalArgumentException](Ingest.parseIgnoreDsl("just_a_table"))
  }

  test("applyMapDsl: resolution on raw values, ignores drop output columns only") {
    // load_dsv.py's docstring scenario: T(x,y), R_1(z,x),
    // --ignore R_1.x --map "R_1: x => T".
    val t = Seq(("x1", "y1"), ("x2", "y2")).toDF("x", "y")
    val r1 = Seq(("z1", "x1")).toDF("z", "x")
    val (parent, child) = Ingest.applyMapDsl(
      Map("T" -> t, "R_1" -> r1),
      Ingest.parseMapDsl("R_1: x => T"),
      ignores = Seq(Ingest.parseIgnoreDsl("R_1.x")))
    assert(parent.columns.toSeq == Seq("x", "y", "T_id"))
    assert(parent.collect().map(r => (r.getString(0), r.getLong(2))).toSet ==
      Set(("x1", 1L), ("x2", 2L)))
    // Child output: ignored key column dropped AFTER resolution.
    assert(child.columns.toSet == Set("z", "T_id"))
    assert(child.select("z", "T_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("z1", 1L)))
  }
}
