package graft.examples

import org.apache.spark.sql.SparkSession

/** Print `explain("formatted")` for headline queries — the plan-audit loop
  * behind PLANS.md. Usage:
  *   sbt "runMain graft.examples.ExplainDemo [sfDir] [query ...]"
  */
object ExplainDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_pricing", "q02_containment_subset", "q40_condensed_report",
        "q45_salted_agg", "q47_ivf_cell_pairs", "q50_stratified_sample",
        "q56_decontamination", "q63_curation_pipeline")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
