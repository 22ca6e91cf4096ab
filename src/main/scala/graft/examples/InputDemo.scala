package graft.examples
import org.apache.spark.sql.SparkSession
object InputDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // good path: the reference's real 2-sample file
    val good = graft.io.PipelineInputs.read(spark, "variant",
      "/root/reference/test/in/2_samples.txt")
    println(s"=== good file: ${good.count()} exploded variant rows, " +
      s"${good.select("patient_id").distinct().count()} patients")
    // bad path: truncated line
    try {
      graft.io.PipelineInputs.read(spark, "variant", "/tmp/bad_input.txt")
      println("=== bad file: NO ERROR (unexpected)")
    } catch {
      case e: graft.io.Dsv.InvalidInputException =>
        println(s"=== bad file rejected: ${e.getMessage.take(90)}")
    }
    spark.stop()
  }
}
