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
}
