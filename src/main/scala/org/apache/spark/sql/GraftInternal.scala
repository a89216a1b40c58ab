package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: build a DataFrame from a hand-constructed
  * (already resolved) logical plan — the entry point graft's custom
  * operators (e.g. the native as-of join) use to hand Catalyst their
  * logical node. Lives in this package solely for `Dataset.ofRows` access.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A full clone of the session — shared context, COPIED SQLConf /
    * temp views / registered functions (unlike `newSession()`, which
    * starts from the context defaults and silently drops every
    * runtime-set conf, AQE flags included). Used to scope per-query conf
    * overrides (e.g. the SPJ bucketing flags) without mutating the
    * caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
