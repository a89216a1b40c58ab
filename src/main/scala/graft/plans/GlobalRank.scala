package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, GenericInternalRow, JoinedRow, NamedExpression, RowNumber, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Native exact global row_number — the physical form of the repo's
  * distributed-rank idiom (`graft.core.DistRank`, built for `agg_gini`,
  * re-planned into `eval_auc`/`events_rfm`/`ann_rrf_fusion`), lifted into
  * a whole-operator Catalyst extension so the NAMED scale-killer shape
  * (`row_number() OVER (ORDER BY …)` with no partition spec — Spark plans
  * it as ONE task sorting the entire frame) has a first-class operator
  * instead of a seven-step DataFrame recipe.
  *
  * Physical plan: the child range-partitions on the sort order (the same
  * exchange a global sort pays — `OrderedDistribution`, EnsureRequirements
  * inserts it) and sorts within partitions; then
  *
  *   1. a COUNT pass computes per-partition row counts. This is a second
  *      job over the child RDD, but the exchange's map output is already
  *      materialized, so stage reuse makes it a shuffle-read-only walk —
  *      no recomputation, no row copying (`RDD.zipWithIndex`'s plan,
  *      executed over UnsafeRows);
  *   2. partition i's global offset = Σ counts(0..i-1) (a driver-side
  *      scan over `numPartitions` longs — metadata, never data);
  *   3. one streaming map pass appends offset + local position.
  *
  * Exactness: range partitions are disjoint and ordered, so offset +
  * within-partition position is the exact global row_number for ANY
  * sampled boundary choice. Ties across a boundary split arbitrarily —
  * exactly like `DistRank`, callers must pass a TOTAL order (append a
  * unique tiebreaker) for deterministic ranks. Unlike the DataFrame
  * recipe this operator needs no `localCheckpoint` pid-pinning: offsets
  * come from a job over the SAME RDD instance, not from a
  * `spark_partition_id` column that two plan branches must agree on.
  *
  * At 100 TB: one range exchange (∝ N/partitions per task) + one
  * shuffle-read count pass, vs the window form's single task holding
  * every row. The count pass is the price of exactness without a second
  * shuffle; it reads shuffle files, it never re-runs the child's lineage.
  *
  * Two faces:
  *   - explicit: [[GlobalRank.withRowNumber]] builds the plan directly
  *     (the `window_exact_quantiles` query path);
  *   - transparent: [[GlobalRankRewrite]] (opt-in,
  *     `spark.graft.distRank.enabled=true`) rewrites a logical Window
  *     whose expressions are ALL plain `row_number()` over an empty
  *     partition spec into this node — result-identical (GlobalRankSpec
  *     gates rule-on ≡ rule-off), type-identical (the rewritten attribute
  *     keeps row_number's IntegerType and exprId), and inert by default
  *     so existing deliberately-bounded global windows keep their plans.
  */
case class GlobalRowNumberPlan(child: LogicalPlan, order: Seq[SortOrder],
    rankAttr: Attribute) extends LogicalPlan with UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GlobalRowNumberPlan = copy(child = newChild)
}

class GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: GlobalRowNumberPlan =>
      GlobalRowNumberExec(p.order, p.rankAttr, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRowNumberExec(order: Seq[SortOrder], rankAttr: Attribute,
    child: SparkPlan) extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = order

  protected override def doExecute(): RDD[InternalRow] = {
    val childRDD = child.execute()
    // Pass 1: per-partition counts. Runs as its own job, but the child's
    // exchange map output is already written, so this stage is a pure
    // shuffle read (rows deserialized and dropped, never copied).
    val counts = childRDD.sparkContext.runJob(childRDD,
      (it: Iterator[InternalRow]) => {
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        c
      })
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = output
    val isInt = rankAttr.dataType == IntegerType
    // Pass 2: stream each partition once, appending offset + position.
    childRDD.mapPartitionsWithIndex({ (pid, iter) =>
      val proj = UnsafeProjection.create(out, out)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var rk = offsets(pid)
      iter.map { r =>
        rk += 1
        // IntegerType face (the row_number rewrite): same 2^31 row bound
        // as Spark's own row_number — overflow behavior is at parity.
        if (isInt) rankRow.update(0, rk.toInt) else rankRow.update(0, rk)
        proj(joined(r, rankRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GlobalRowNumberExec = copy(child = newChild)
}

/** Opt-in optimizer rule (`spark.graft.distRank.enabled=true`): rewrite
  * `Window` nodes whose window expressions are ALL bare `row_number()`
  * with an EMPTY partition spec into [[GlobalRowNumberPlan]]. Matches
  * nothing else — ranks with tie semantics (`rank`, `dense_rank`),
  * aggregate windows, and mixed expression lists keep their WindowExec,
  * and partitioned windows are already parallel. Defensive-parse
  * discipline (the RangeBinJoin lesson): any value other than "true" is
  * OFF, never a throw inside the optimizer.
  */
object GlobalRankRewrite extends Rule[LogicalPlan] {
  val Key = "spark.graft.distRank.enabled"

  private def asRowNumberAlias(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(Nil, _, _)), _) => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Key, "false").trim.equalsIgnoreCase("true"))
      return plan
    plan transform {
      case Window(exprs, Nil, order, child, _)
          if order.nonEmpty && exprs.nonEmpty &&
            exprs.forall(asRowNumberAlias(_).isDefined) =>
        // chain one node per row_number alias (they share the same
        // orderSpec by Window's construction), preserving each alias's
        // exprId and IntegerType so parent operators resolve unchanged
        exprs.foldLeft(child) { (c, e) =>
          val a = asRowNumberAlias(e).get
          GlobalRowNumberPlan(c, order,
            AttributeReference(a.name, IntegerType,
              nullable = false)(a.exprId, a.qualifier))
        }
    }
  }
}

/** DataFrame-level API over the native operator. */
object GlobalRank {

  /** Registers the strategy on an existing session (idempotent); the
    * build-time path is `GraftExtensions.injectPlannerStrategy`.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val es = spark.experimental.extraStrategies
    if (!es.exists(_.isInstanceOf[GlobalRankStrategy]))
      spark.experimental.extraStrategies = es :+ new GlobalRankStrategy
  }

  /** `df` plus LONG column `outCol` = exact global 1-based row_number
    * under `keys` ((column, ascending) pairs — pass a total order). The
    * native twin of `DistRank.withRowNumber`.
    */
  def withRowNumber(df: DataFrame, outCol: String,
      keys: (String, Boolean)*): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = df.queryExecution.analyzed
    val order = keys.map { case (n, asc) =>
      val a = plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
      SortOrder(a, if (asc) Ascending else Descending)
    }
    GraftInternal.ofRows(spark, GlobalRowNumberPlan(plan, order,
      AttributeReference(outCol, LongType, nullable = false)()))
  }
}
