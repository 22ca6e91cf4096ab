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
    // bad path: truncated line (fixture written here so the demo is
    // self-contained)
    val bad = java.io.File.createTempFile("graft_bad_input", ".txt")
    bad.deleteOnExit()
    java.nio.file.Files.write(bad.toPath,
      "patient1\tchr1\tsnp1\n".getBytes("UTF-8"))
    try {
      graft.io.PipelineInputs.read(spark, "variant", bad.getAbsolutePath)
      println("=== bad file: NO ERROR (unexpected)")
    } catch {
      case e: graft.io.Dsv.InvalidInputException =>
        println(s"=== bad file rejected: ${e.getMessage.take(90)}")
    }
    spark.stop()
  }
}
