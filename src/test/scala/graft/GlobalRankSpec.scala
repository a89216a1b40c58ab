package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.{GlobalRank, GlobalRankRewrite, GlobalRowNumberExec}

/** The native exact global row_number operator: result-identical to the
  * single-partition window form on a total order, planned WITHOUT any
  * WindowExec or single-partition sort, and (under the opt-in conf) the
  * optimizer rewrite swaps Window-form plans transparently.
  */
class GlobalRankSpec extends SparkSpec {

  private def events = Tables.read(spark, sf, "events")
    .select("event_id", "user_id", "value")

  test("native rank equals window row_number on a total order") {
    import org.apache.spark.sql.Row
    val want = events
      .withColumn("rk", row_number().over(
        Window.orderBy(col("value").desc, col("event_id"))).cast("long"))
      .orderBy("event_id").collect().toSeq
    val got = GlobalRank.withRowNumber(events, "rk",
      ("value", false), ("event_id", true))
      .orderBy("event_id").collect().toSeq
    assert(got.size === want.size)
    assert(got === want)
    // and the plan carries the native operator, no WindowExec anywhere
    // (AQE wraps the tree — inspect with it off, the PlanAudit discipline)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = GlobalRank.withRowNumber(events, "rk", ("event_id", true))
        .queryExecution.executedPlan
      assert(phys.collectFirst { case e: GlobalRowNumberExec => e }.nonEmpty)
      assert(phys.collectFirst { case w: WindowExec => w }.isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // degenerate frames: empty input and a 1-row input both rank cleanly
    assert(GlobalRank.withRowNumber(events.filter(lit(false)), "rk",
      ("event_id", true)).collect().isEmpty)
    assert(GlobalRank.withRowNumber(events.limit(1), "rk",
      ("event_id", true)).select("rk").collect().toSeq === Seq(Row(1L)))
  }

  test("ranks are exact across partitions: dense 1..N, offsets correct") {
    val n = events.count()
    val ranked = GlobalRank.withRowNumber(events, "rk",
      ("value", true), ("event_id", true))
    val stats = ranked.agg(min("rk"), max("rk"),
      countDistinct("rk"), count(lit(1))).head()
    assert(stats.getLong(0) === 1L)
    assert(stats.getLong(1) === n)
    assert(stats.getLong(2) === n)
    // monotone: rank order agrees with the sort order pairwise
    val viol = ranked.select(col("rk"), col("value"), col("event_id"))
      .as("a").join(ranked.select(col("rk").as("rk2"),
        col("value").as("v2"), col("event_id").as("e2")).as("b"),
        col("rk") + 1 === col("rk2"))
      .filter(col("value") > col("v2") ||
        (col("value") === col("v2") && col("event_id") > col("e2")))
      .count()
    assert(viol === 0L)
  }

  test("opt-in rewrite: row_number window becomes the native operator") {
    def windowForm = events.withColumn("rk",
      row_number().over(Window.orderBy(col("value").desc, col("event_id"))))
    val off = windowForm.queryExecution.executedPlan
    assert(off.collectFirst { case e: GlobalRowNumberExec => e }.isEmpty,
      "rule must be inert without the conf")
    spark.conf.set(GlobalRankRewrite.Key, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = windowForm.queryExecution
      assert(qe.executedPlan.collectFirst {
        case e: GlobalRowNumberExec => e }.nonEmpty,
        qe.executedPlan.toString)
      assert(qe.executedPlan.collectFirst { case w: WindowExec => w }.isEmpty)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // result-transparent: identical rows to the rule-off plan,
      // identical schema (row_number's IntegerType survives the rewrite)
      val on = windowForm.orderBy("event_id").collect().toSeq
      spark.conf.unset(GlobalRankRewrite.Key)
      val base = windowForm.orderBy("event_id").collect().toSeq
      assert(on === base)
    } finally {
      spark.conf.unset(GlobalRankRewrite.Key)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("rewrite leaves partitioned, non-row_number, and mixed windows alone") {
    spark.conf.set(GlobalRankRewrite.Key, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val partitioned = events.withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")))
      assert(partitioned.queryExecution.executedPlan.collectFirst {
        case e: GlobalRowNumberExec => e }.isEmpty)
      val rank = events.withColumn("rk",
        org.apache.spark.sql.functions.rank().over(
          Window.orderBy(col("value"))))
      assert(rank.queryExecution.executedPlan.collectFirst {
        case e: GlobalRowNumberExec => e }.isEmpty,
        "rank() has tie semantics the operator does not implement")
      // malformed conf value: off, never a throw inside the optimizer
      spark.conf.set(GlobalRankRewrite.Key, "banana")
      val q = events.withColumn("rk", row_number().over(
        Window.orderBy(col("event_id"))))
      assert(q.queryExecution.executedPlan.collectFirst {
        case e: GlobalRowNumberExec => e }.isEmpty)
      assert(q.count() > 0)
    } finally {
      spark.conf.unset(GlobalRankRewrite.Key)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
