package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests for the three properties the engine's
  * 100 TB posture rests on, asserted against `explain` output so a future
  * refactor cannot silently lose them:
  *
  *  - predicate pushdown reaches the parquet scan (`PushedFilters`);
  *  - column pruning reaches the scan (`ReadSchema` carries ONLY the
  *    referenced columns — a scan reading all columns for a 2-column
  *    projection pays the full row width at every scale);
  *  - job-scoped stage reads prune partitions (`PartitionFilters` on the
  *    job_id layout, no data-file read for other jobs);
  *  - hot paths stay inside WholeStageCodegen (the custom expressions are
  *    codegen'd; an interpreted fallback would show as a codegen break).
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-shape-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("filter + projection push down to the parquet scan") {
    val plan = docs.filter(col("doc_id") < 100).select("doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"scan must read only the projected columns:\n$plan")
  }

  test("operators prune the scan to the columns they use") {
    // repetitionReport touches doc_id + text; the documents table also
    // carries lang/source/n_chars, which must NOT be read by ANY of the
    // plan's scans (multi-branch plans scan the table more than once).
    val plan = graft.ops.Curation.repetitionReport(docs, "doc_id", "text",
        separator = " ")
      .queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.exists(_.contains("text")), plan)
    reads.foreach { read =>
      assert(!read.contains("source") && !read.contains("lang") &&
        !read.contains("n_chars"),
        s"unused columns leaked into a scan: $read")
    }
  }

  test("job-scoped stage reads prune to one job_id partition") {
    val base = graft.TestScratch.dir("graft-planshape")
    val store = new JobStore(base)
    import spark.implicits._
    val stage = Seq((1L, "p1", "g1"), (2L, "p2", "g2"))
      .toDF("job_id", "patient_id", "gene_name")
    store.writeJob(stage.filter($"job_id" === 1), "stage_t", 1L)
    store.writeJob(stage.filter($"job_id" === 2), "stage_t", 2L)
    val plan = store.read(spark, "stage_t", jobId = Some(1L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("job_id"),
      s"job filter must prune partitions, not scan-and-filter:\n$plan")
    // the partition column is directory metadata, never in the data read
    assert("ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .exists(!_.group(1).contains("job_id")), plan)
  }

  test("hot paths run inside WholeStageCodegen (custom expressions included)") {
    // AQE renders unexecuted plans without the codegen wrapping; flip it
    // off for the assertion only.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // codegen stages print as "*(n)" prefixes on their member operators
      val agg = docs.groupBy("source").agg(sum("n_chars")).queryExecution
        .executedPlan
      assert(agg.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty, agg.toString)
      // the MinHash signature projection is a custom codegen Expression; it
      // must sit inside a codegen stage, not fall back to interpreted eval
      val sig = graft.ops.Dedup.minHashSignatures(docs, "doc_id", "text")
        .queryExecution.executedPlan
      val spans = sig.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(spans.exists(_.contains("minhashsig")),
        s"the minhashsig projection must be inside a codegen span:\n$sig")
      assert(spans.exists(_.contains("shingleset")),
        s"the shingleset filter/projection must be inside a codegen span:\n$sig")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
