package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format most LLM corpus
  * tooling speaks (one JSON object per line, gzip-splittable at the file
  * level, schema carried out-of-band).
  *
  * Read discipline for scale: the schema is EXPLICIT, never inferred —
  * Spark's JSON schema inference is a full extra pass over the data (at
  * 100 TB, a second scan before the first real one) and type-widens on
  * dirty rows. `FAILFAST` surfaces malformed lines as errors at read time
  * (the [[Dsv]] reader's bad-line contract); `failOnMalformed = false`
  * drops them instead, for ingest-from-the-wild.
  */
object JsonLines {

  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      failOnMalformed: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failOnMalformed) "FAILFAST" else "DROPMALFORMED")
      .json(path)

  /** Write as JSONL part files; `shards > 0` round-robins into that many
    * files (training-data export convention: fixed shard counts for
    * loader parallelism).
    */
  def write(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").json(path)
  }
}
