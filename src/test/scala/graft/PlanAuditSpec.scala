package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Executable form of PLANS.md's audit claims: the plan properties the
  * 100 TB story rests on (pushdown, pruning, broadcast-only stampings,
  * shuffle-free map-side ops) asserted on the real executed plans, so a
  * regression in any of them fails the suite instead of only drifting a
  * bench number. AQE is disabled per-assertion: query stages hide the
  * subtree structure `collect` walks, and the audited shape is identical
  * either way.
  */
class PlanAuditSpec extends SparkSpec {

  private def executed(df: => DataFrame) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def shuffles(plan: org.apache.spark.sql.execution.SparkPlan) =
    plan.collect { case e: ShuffleExchangeExec => e }

  test("filter_range: predicates reach the parquet scan, schema pruned") {
    val plan = executed(SparkEntry.queries("filter_range")(spark, sf))
    val scan = plan.toString
    assert(scan.contains("PushedFilters:") &&
      (scan.contains("GreaterThanOrEqual(l_shipdate") ||
        scan.contains("IsNotNull(l_shipdate")),
      s"range filter not pushed:\n$scan")
    // the fact table is 16 columns; the query needs 4 — the ReadSchema
    // must not contain an unprojected wide column
    assert(!scan.contains("l_comment"), "column pruning lost l_comment")
  }

  test("join_fact_dims: every stamping is a broadcast join, never shuffle-side") {
    // the dim-BUILD subtrees aggregate (distinct keys → small exchanges,
    // dim-sized); the audited claim is that the FACT side joins by
    // broadcast only — no sort-merge/shuffled-hash join anywhere
    val plan = executed(SparkEntry.queries("join_fact_dims")(spark, sf))
    val s = plan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"fact joined through a shuffle:\n$s")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3,
      s"expected >=3 broadcast stampings:\n$s")
  }

  test("sample_split: pure map-side — zero exchanges before the order-by") {
    val plan = executed(SparkEntry.queries("sample_split")(spark, sf))
    val nonSortShuffles = shuffles(plan)
      .filterNot(_.outputPartitioning.toString.contains("rangepartitioning"))
    assert(nonSortShuffles.isEmpty,
      s"salted-hash split should not shuffle:\n$plan")
  }

  test("dedup_incremental: no cartesian/nested-loop anywhere in the plan") {
    val plan = executed(
      SparkEntry.queries("dedup_incremental")(spark, sf)).toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay bucket-keyed:\n$plan")
  }

  test("join_fuzzy: deletion-key join is hash-equi, never nested-loop") {
    val plan = executed(SparkEntry.queries("join_fuzzy")(spark, sf)).toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"SymSpell candidates must come from the key join:\n$plan")
  }

  test("scan_partition_pruned: only the matching fiscal-year partition is read") {
    val plan = executed(
      SparkEntry.queries("scan_partition_pruned")(spark, sf)).toString
    assert(plan.contains("PartitionFilters:") && plan.contains("fy"),
      s"partition pruning not planned:\n$plan")
  }
}
