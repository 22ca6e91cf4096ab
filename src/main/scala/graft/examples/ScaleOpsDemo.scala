package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-3 surfaces: regex DSV reading, merge upsert, bucketed stage
  * store, Bloom-pruned joins, and the batch interval join.
  */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println("=== Dsv.readRegex: regex separator + index projection ===")
    val f = java.nio.file.Files.createTempFile("demo", ".txt")
    java.nio.file.Files.writeString(f, "p1 ,  g1,*1\np2,g1 , *2")
    graft.io.Dsv.readRegex(spark, f.toString, sepRegex = "\\s*,\\s*",
      header = Seq("patient", "gene", "haplotype"), fields = Seq("patient", "haplotype"))
      .show(false)

    println("=== Upsert.merge: caller-supplied update clause ===")
    val existing = Seq(("k1", 10), ("k2", 20)).toDF("k", "n")
    val incoming = Seq(("k2", 5), ("k3", 7)).toDF("k", "n")
    graft.ops.Upsert.merge(existing, incoming, Seq("k"),
      mergeCols = Map("n" -> ((old, nu) => old + nu))).orderBy("k").show()

    println("=== Bloom-pruned join (exact result, pruned shuffle) ===")
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    val dim = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val joined = graft.ops.Sketches.bloomPrunedJoin(fact, dim, "l_orderkey", "l_orderkey")
    println(s"joined rows: ${joined.count()} (fact ${fact.count()}, dim ${dim.count()})")

    println("=== Interval join: click -> purchase within 30 min ===")
    val events = graft.streaming.EventsStream.readEvents(
      spark, "/root/testdata/sf0.001/events.parquet")
    graft.streaming.EventsStream.intervalJoinBatch(events, "click", "purchase")
      .orderBy("left_id", "right_id").show(5)

    println("=== Bucketed stage store: shuffle-free downstream agg ===")
    val root = java.nio.file.Files.createTempDirectory("demo-store").toString
    val store = new graft.pipeline.JobStore(root)
    val gh = (1 to 1000).map(i => (1L, s"p${i % 50}", "g1", s"*${i % 3}"))
      .toDF("job_id", "patient_id", "gene_name", "haplotype_name")
    store.writeJobBucketed(gh, "job_patient_gene_haplotype", 1L, Seq("patient_id"), 4)
    val perPatient = store.readBucketed(spark, "job_patient_gene_haplotype", 1L)
      .groupBy("patient_id").count()
    val plan = perPatient.queryExecution.executedPlan.toString
    println(s"agg over bucketed read has Exchange: ${plan.contains("Exchange")}")
    perPatient.orderBy("patient_id").show(3)
    spark.stop()
  }
}
