package graft.examples
import org.apache.spark.sql.SparkSession
import graft.ops.RowOps
/** Drives the report row-shaping ops through the public package boundary. */
object NoDupDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1,1,2,3),(2,1,3,3),(3,1,3,4)).toDF("ord","a","b","c")
    val out = RowOps.noDuplicates(df, Seq(
      RowOps.DupGroup("A", Seq("a"), Seq("a","b")),
      RowOps.DupGroup("B", Seq("b"), Seq("b","c"))), Seq("ord"))
    out.orderBy("ord").show()
    val collapsed = RowOps.collapse(RowOps.sparseRows(out.orderBy("ord").drop("ord")))
    collapsed.foreach(println)
    spark.stop()
  }
}
