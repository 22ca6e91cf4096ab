package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` columns with typed metadata, and per-batch
  * decode/feature steps run as `mapPartitions` over the typed Dataset (the
  * Scala analogue of arrow-batched pandas UDFs: one JVM closure per
  * partition, amortized setup, bounded memory per batch).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from the
  * byte payload. The Spark-side contract — schema, partitioning, batch
  * iteration shape — is real and tested; swap `decodeStub` for a JNI/opencv
  * call at deployment.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded media features (stub: would be codec output in production). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Deterministic fake decode: dimensions derived from the payload bytes.
    * Stands in for `???` / a real codec — STUB, clearly marked.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length
    // "Decoded" dimensions are simple deterministic functions of the payload
    // length so the plumbing is externally checkable; checksum is a real
    // byte-level rolling hash (what a codec's frame hash would be).
    var h = 1125899906842597L
    var i = 0
    while (i < len) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
    val w = 16 + (len.toLong * 7919L % 1024L).toInt
    val ht = 16 + (len.toLong * 104729L % 1024L).toInt
    val frames = r.kind match {
      case "video" => 1 + (len % 300)
      case _ => 1
    }
    MediaFeatures(r.media_id, r.kind, len, w, ht, frames, h)
  }

  /** Partition-batched decode: the real plumbing (schema in, schema out,
    * executor-local batch loop). Repartitions to spread large payloads.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow],
      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parted = if (partitions > 0) media.repartition(partitions) else media
    parted.mapPartitions(_.map(decodeStub))
  }

  /** Deterministic frame sampling for video rows: every `stride`-th frame
    * index up to n_frames (metadata-level; the payload slice would happen in
    * the decoder in production).
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .withColumn("sampled_frames",
        when(col("n_frames") > 0,
          size(sequence(lit(0), col("n_frames") - 1, lit(stride))))
          .otherwise(lit(0)))

  /** Aspect-preserving resize to fit a bounding box (the usual pre-embedding
    * normalization step): computes target dimensions per row; the pixel
    * work is the decoder's job (STUBBED here), the dimension math and
    * column contract are real.
    */
  def resizeToFit(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"),
      lit(1.0))
    features
      .withColumn("resized_width", floor(col("width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("height") * scale).cast("int"))
  }

  /** Synthetic media corpus derived from any table: payload bytes from a
    * string column. Lets the multimodal path run on the standard test data.
    */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String,
      payloadFrom: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col(payloadFrom), "UTF-8").as("payload"),
        lit("synthetic").as("source"))
      .as[MediaRow]
  }
}
