package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequent items) via the approx-then-verify pattern:
  * a per-partition Misra-Gries summary proposes a small candidate set, a
  * second pass counts ONLY the candidates exactly. Same two-stage shape as
  * the LSH-gated dedups ([[Dedup]]): the sketch bounds the work, the exact
  * pass guarantees the answer.
  *
  * Correctness: an item with global count > N/k must have per-partition
  * count > N_p/k in at least one partition (pigeonhole over the partition
  * sums), and Misra-Gries with k counters retains every item whose local
  * count exceeds N_p/k. So the union of per-partition summaries contains
  * every global heavy hitter, and the exact second pass removes the false
  * positives — the output is EXACTLY `{x : count(x) * k > N}`.
  *
  * Scale: the candidate set is ≤ k·P entries regardless of data size, so
  * the verify join is always a broadcast; total cost is two scans and one
  * small shuffle. A global groupBy-count-then-filter computes the same
  * answer with a full-width shuffle of every distinct item — this does it
  * with state O(k) per task.
  */
object HeavyHitters {

  /** Misra-Gries with k counters over one iterator. Returns surviving
    * candidate items (their counts are only lower bounds — discarded).
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    var pending = 0L // joint decrement owed to all counters
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k => counters.update(x, pending + 1)
        case None =>
          // decrement-all step, done lazily: bump the floor and evict
          pending += 1
          counters.filterInPlace((_, c) => c > pending)
      }
    }
    counters.keysIterator.filter(x => counters(x) > pending)
  }

  /** Exact items with count(item) * k > N over `df(col)`, with their exact
    * counts. One sketch pass (also tallies N per partition via a null-item
    * marker row) + one exact pass over candidates only.
    */
  def exact(spark: SparkSession, df: DataFrame, itemCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))

    // Pass 1: per-partition (candidates, partition row count). The null-item
    // row carries N_p so the total N needs no extra scan.
    val summary = items.as[String].mapPartitions { it =>
      var n = 0L
      val counted = it.map { x => n += 1; x }
      val cands = misraGries(counted, k).map(x => (x, 0L)).toVector
      (cands :+ ((null: String, n))).iterator
    }.toDF("item", "np")

    val cands = summary.filter(col("item").isNotNull).select("item").distinct()
    val total = summary.filter(col("item").isNull)
      .agg(sum(col("np")).as("n_total"))

    // Pass 2: exact counts of candidates only (broadcast semi-join keeps it
    // map-side), then the exact threshold test against N.
    items.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("item"), col("cnt"), col("n_total"))
      .orderBy(desc("cnt"), col("item"))
  }
}
