package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.io.Bucketing

/** Bucketed co-located joins: once both sides are bucketed on the key, the
  * join plans with zero shuffle exchanges.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("join of two tables bucketed on the key has no shuffle") {
    val li = graft.core.Tables.read(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.core.Tables.read(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    // disable broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() === li.count())
      val plan = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(plan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found: $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
