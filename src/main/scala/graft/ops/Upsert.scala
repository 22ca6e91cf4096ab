package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based upsert rewrites.
  *
  * The reference leans on MySQL's `INSERT ... ON DUPLICATE KEY UPDATE`
  * (`/root/reference/src/groovy/haplorec/util/Sql.groovy:373-408`) with two
  * modes: `'discard'` (keep the existing row) and `'update'` (new row wins).
  * Spark has no unique-key enforcement, so both become join/window rewrites
  * executed as one shuffle on the key columns; the anti-join of `discard`
  * broadcasts when the new side is small, and AQE handles skewed keys.
  */
object Upsert {

  /** New rows whose key already exists are discarded (`Sql.groovy:394-398`).
    * Duplicate keys *within* `newRows` keep one arbitrary-but-deterministic
    * row (lowest by `tieBreak`, defaulting to the key itself).
    */
  def discard(
      existing: DataFrame,
      newRows: DataFrame,
      keys: Seq[String],
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val order = (if (tieBreak.nonEmpty) tieBreak else keys).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val dedupedNew = newRows
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    existing.unionByName(dedupedNew.join(existing, keys, "left_anti"))
  }

  /** New rows replace existing rows with the same key (`Sql.groovy:399-404`
    * `'update'` mode).
    */
  def update(
      existing: DataFrame,
      newRows: DataFrame,
      keys: Seq[String],
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val order = (if (tieBreak.nonEmpty) tieBreak else keys).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val dedupedNew = newRows
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    existing.join(dedupedNew, keys, "left_anti").unionByName(dedupedNew)
  }
}
