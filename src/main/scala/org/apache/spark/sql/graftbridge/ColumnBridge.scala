package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ catalyst Expression
  * conversion, needed to expose custom codegen expressions (e.g.
  * `graft.functions.VecDot`) as user-facing Columns. Lives under the
  * `org.apache.spark.sql` package solely for access; no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session-converted form: unlike [[expression]]'s lazy wrapper (fine
    * when the Column wraps an already-built catalyst expression), this
    * runs the session's ColumnNode→Expression converter EAGERLY, so a
    * Column built from API compositions (`filter(split(...))`) yields a
    * plain catalyst tree of `UnresolvedFunction`s the analyzer resolves
    * in-plan — required when the result is returned from a function
    * registry builder, where an opaque wrapper never gets converted.
    */
  def expression(c: Column, spark: org.apache.spark.sql.SparkSession): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** `CollectTopK(item, k)` as a Column aggregate: a bounded k-element
    * priority queue at every aggregation level (map-side partials
    * included). `reverse = true` keeps the k SMALLEST items under the
    * item type's natural ordering. The expression is `private[sql]`, hence
    * this bridge.
    */
  def collectTopK(item: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectBridge
        .collectTopK(ExpressionUtils.expression(item), k, reverse)
        .toAggregateExpression())
}
