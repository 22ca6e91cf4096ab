package graft.examples
import org.apache.spark.sql.SparkSession
import graft.pipeline.JobStore
object JobStoreDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val store = new JobStore("/tmp/graft_jobstore_demo")
    store.writeJob(Seq((1L,"p1","*1")).toDF("job_id","patient_id","haplotype_name"), "job_patient_gene_haplotype", 1L)
    store.writeJob(Seq((2L,"p2","*2")).toDF("job_id","patient_id","haplotype_name"), "job_patient_gene_haplotype", 2L)
    store.writeJob(Seq((1L,"p1","*9")).toDF("job_id","patient_id","haplotype_name"), "job_patient_gene_haplotype", 1L)
    println("=== all jobs after re-running job 1 ===")
    store.read(spark, "job_patient_gene_haplotype").orderBy("job_id").show()
    spark.stop()
  }
}
