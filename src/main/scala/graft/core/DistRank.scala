package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row_number without a single-partition sort — the
  * distributed-rank idiom (first built for `agg_gini`, re-planned into
  * `eval_auc` round 11, now shared): range-partition on the sort order,
  * row_number WITHIN each partition, then add each partition's global
  * offset from a partition-count frame that is only
  * `spark.sql.shuffle.partitions` rows (broadcast back).
  *
  * `Window.orderBy(...)` with no partition spec plans as ONE task sorting
  * the whole frame — fine on a 32-row pid table, a named scale-killer on
  * anything data-proportional (N user rows at 100 TB = one executor sorts
  * every user). This shape pays one range exchange instead and every
  * stage stays ∝ N/partitions.
  *
  * Exactness: `repartitionByRange` boundaries are SAMPLED, so partition
  * SIZES vary run to run — but rank does not: ranges are disjoint and
  * ordered, so offset + within-partition row_number is the exact global
  * row_number for any boundary choice. Callers must pass a TOTAL order
  * (append a unique tiebreaker column) or ranks of tied rows are
  * nondeterministic. The frame is localCheckpoint'd so the two consumers
  * of `spark_partition_id` (the offset agg and the ranked output) see the
  * SAME placement.
  */
object DistRank {

  /** `df` plus `outCol` = exact global 1-based row_number under `order`
    * (a total order; include a unique tiebreaker). One range exchange of
    * `df` + a `partitions`-row offset broadcast; no global sort.
    */
  def withRowNumber(df: DataFrame, outCol: String, order: Column*)
      : DataFrame = withRowNumber(df, outCol,
    // scale-adaptive default: spark.sql.shuffle.partitions (the bench
    // pins it to the core count; a cluster sizes it to the data) — a
    // hard-coded 32 was right locally and wrong everywhere else
    df.sparkSession.sessionState.conf.numShufflePartitions, order: _*)

  def withRowNumber(df: DataFrame, outCol: String, partitions: Int,
      order: Column*): DataFrame = {
    val parted = df
      .repartitionByRange(partitions, order: _*)
      .withColumn("__dr_pid", spark_partition_id())
      .localCheckpoint() // pin pid across the frame's two consumers
    val offs = parted.groupBy("__dr_pid")
      .agg(count(lit(1)).as("__dr_cnt"))
      .withColumn("__dr_off", coalesce(sum(col("__dr_cnt")).over(
        Window.orderBy("__dr_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__dr_pid", "__dr_off")
    parted
      .join(broadcast(offs), "__dr_pid")
      .withColumn(outCol,
        row_number().over(
          Window.partitionBy("__dr_pid").orderBy(order: _*)).cast("long") +
          col("__dr_off"))
      .drop("__dr_pid")
  }

  /** SQL-standard `ntile(k)` bucket from an exact 1-based rank column and
    * a total-count column (both LONG): the first `n % k` buckets take
    * `n div k + 1` rows, the rest `n div k` — identical to Spark's and
    * DuckDB's NTile, so an oracle written with plain `ntile()` gates this
    * distributed form exactly. Integer-only (`div`), no float boundaries.
    * Degenerate n < k: the else branch's divisor is 0 but unreachable
    * (every rank falls in the first `n % k = n` buckets of size 1).
    */
  def ntileFromRank(rank: String, total: String, k: Int): Column = expr(
    s"""CASE WHEN $rank <= ($total % $k) * ($total div $k + 1)
       |  THEN ($rank - 1) div ($total div $k + 1) + 1
       |  ELSE $total % $k
       |    + ($rank - 1 - ($total % $k) * ($total div $k + 1))
       |      div ($total div $k) + 1
       |END""".stripMargin)
}
