package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar interchange format large lake
  * deployments standardize on (Hive-lineage warehouses in particular).
  * Spark's native vectorized ORC reader gives the same scan properties as
  * parquet: column pruning, predicate pushdown into stripe/row-group
  * statistics, and splittable stripes, so a 100 TB ORC corpus scans with
  * the identical plan shape as its parquet twin (verify with `.explain`:
  * `PushedFilters`/`ReadSchema` appear on the OrcScan exactly as on
  * parquet).
  *
  * The schema is EXPLICIT on read, like [[JsonLines]]: ORC files carry
  * their own schema, but pinning it keeps ingest contracts engine-checked
  * (a drifted upstream export fails loudly at analysis instead of
  * type-widening downstream).
  */
object Orc {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write as ORC part files; `shards > 0` round-robins into that many
    * files (same convention as [[JsonLines.write]]).
    */
  def write(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").orc(path)
  }
}
