package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark's partial-mergeable bounded-heap top-k aggregate —
  * [[CollectTopK]] is package-private at the Scala level (public bytecode).
  * Same extension seam as graftshims.GraftSqlShims; no Spark internals are
  * modified. reverse=true collects the k SMALLEST child values and eval
  * returns them as an ascending array.
  */
object GraftTopK {
  def smallestK(child: Expression, k: Int): Expression =
    CollectTopK(child, k, reverse = true)
}
