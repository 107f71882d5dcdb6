package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard extension
  * shim (a library-owned file in the `org.apache.spark.sql` package) for
  * turning a custom [[LogicalPlan]] node into a user-facing DataFrame.
  * Used by graft.plans.IntervalJoin; no Spark internals are modified.
  */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
