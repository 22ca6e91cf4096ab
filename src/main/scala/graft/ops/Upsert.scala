package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Caller-supplied update clause — the reference's third `onDuplicateKey`
    * mode (`Sql.groovy:399-408`): a closure generating the
    * `ON DUPLICATE KEY UPDATE` SQL from the old-row and new-row aliases.
    * Spark-native form: per-column merge functions of (existing value,
    * incoming value); columns without a merge function keep the existing
    * value. Existing rows with no incoming match pass through; incoming
    * rows with no existing match insert as-is.
    *
    * One shuffle on the keys for the merge join plus one for the anti-join
    * insert side (broadcast when the deduped incoming side is small).
    */
  def merge(
      existing: DataFrame,
      newRows: DataFrame,
      keys: Seq[String],
      mergeCols: Map[String, (Column, Column) => Column],
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val order = (if (tieBreak.nonEmpty) tieBreak else keys).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val dedupedNew = newRows
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val nonKey = existing.columns.filterNot(keys.contains).toSeq
    val newAliased = dedupedNew.select(
      (keys.map(col) :+ lit(1).as("__matched")) ++
        nonKey.map(c => col(c).as(s"__new_$c")): _*)
    val updated = existing.join(newAliased, keys, "left")
      .select(keys.map(col) ++ nonKey.map { c =>
        val merged = mergeCols.get(c)
          .map(f => f(col(c), col(s"__new_$c")))
          .getOrElse(col(c))
        when(col("__matched").isNotNull, merged).otherwise(col(c)).as(c)
      }: _*)
    val inserts = dedupedNew.join(existing, keys, "left_anti")
    updated.unionByName(inserts.select(existing.columns.map(col): _*))
  }
}
