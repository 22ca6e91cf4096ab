package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge to the `private[aggregate]` [[CollectTopK]] typed
  * aggregate (a bounded k-element priority queue at every aggregation
  * level — the memory-safe top-k building block Spark itself uses for the
  * pandas-API `nlargest`/`nsmallest`). Lives in this package solely for
  * access; no Spark internals are modified.
  */
object GraftCollectBridge {
  /** `reverse = true` keeps the k SMALLEST items under the item type's
    * natural ordering (so order on `(-sim, id)` for descending-similarity
    * top-k with ascending-id tie-break).
    */
  def collectTopK(item: Expression, k: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(item, k, reverse)
}
