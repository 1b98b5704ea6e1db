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

  /** Bridge into `private[sql] SparkSession.cloneSession()`: an isolated
    * copy of the session STATE (runtime conf, temp functions/views) over
    * the same SparkContext/SharedState, so a conf change scoped to one
    * query's plan ([[graft.functions.TopK.sessionWithHashAggCapacity]])
    * can ride the clone without mutating the caller's session. The
    * public `newSession()` is NOT a substitute: it resets runtime confs
    * and the function registry to SparkConf defaults, dropping both the
    * caller's conf.set state and every registerInto'd temp function.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
