package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor: the public API has
  * no way to wrap a custom (injected) LogicalPlan into a DataFrame, which
  * a planner-extension operator needs ([[graft.plans.PathSpanJoin]]).
  * Single call, no other internals touched.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
