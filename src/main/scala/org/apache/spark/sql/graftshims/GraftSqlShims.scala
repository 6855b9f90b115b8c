package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal access shim: build a DataFrame from a hand-constructed logical
  * plan (`Dataset.ofRows` is private[sql]). This is the standard extension
  * seam every Spark connector/plugin uses to register custom logical
  * nodes; no Spark internals are modified.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Whether `strategy` is registered in the session's planner — the real
    * thing the native-as-of guard cares about, robust to extensions being
    * installed programmatically (builder.withExtensions) where the
    * spark.sql.extensions conf stays empty.
    */
  def hasStrategy(spark: SparkSession, strategy: AnyRef): Boolean =
    spark.asInstanceOf[ClassicSparkSession].sessionState.planner
      .extraPlanningStrategies.exists(_ eq strategy)

  /** Spark's partial-mergeable bounded-heap top-k aggregate (CollectTopK
    * is package-private at the Scala level though public bytecode; the
    * in-package GraftTopK object provides the constructor). Collects the
    * k SMALLEST child values; eval returns them as an ascending array.
    */
  def collectTopK(child: org.apache.spark.sql.catalyst.expressions.Expression,
      k: Int): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopK
      .smallestK(child, k)
}
