package graft.examples

import org.apache.spark.sql.SparkSession
import graft.multimodal.Multimodal

/** Drives the multimodal plumbing end-to-end: synthetic binary payloads →
  * partition-batched real header decode (PNG/GIF/BMP, WAV, MP4) → frame
  * sampling → aspect-fit resize.
  */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
    val features = Multimodal.decodeFeatures(spark, media, partitions = 4)
    val shaped = Multimodal.resizeToFit(
      Multimodal.sampleFrames(features.toDF(), stride = 10), 224, 224)
    println("=== multimodal pipeline (decode -> sample -> resize) ===")
    shaped.select("media_id", "kind", "byte_len", "width", "height",
        "n_frames", "sampled_frames", "resized_width", "resized_height")
      .orderBy("media_id").show(6)
    spark.stop()
  }
}
