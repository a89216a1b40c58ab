package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line operators over interval data (SURVEY §2.4 "not present"
  * class — peak-concurrency is the canonical capacity-planning query over
  * any sessionized event stream).
  *
  * The running interval count is a DISTRIBUTED TWO-PHASE PREFIX SUM — the
  * textbook parallel-scan algorithm expressed in DataFrames:
  *   phase 1: per hour-bucket boundary sums (one map-side-combined
  *            aggregate; |buckets| rows — TIME-span-bounded, not
  *            data-bounded: a decade of hours is ~87k rows);
  *   phase 2: per-bucket carry-ins via a window over that tiny frame,
  *            broadcast back; the data-sized running sum is then a window
  *            PARTITIONED BY bucket, so every hour scans independently —
  *            no single-partition global window ever touches the
  *            boundary-mass frame.
  * Ordering at equal t processes −1 before +1 (d ascending ⇒ half-open
  * [start, end) intervals), and both engines' default RANGE frame
  * collapses (t, d) ties to the tie-group-end value, so the per-row run
  * is engine-identical regardless of intra-tie row order.
  */
object Sweep {

  private val HourUs = 3600000000L

  /** Peak concurrent intervals per hour. Each event row opens an interval
    * [ts, ts + max(1, ⌊value⌋) seconds); output is one row per hour with
    * ≥1 boundary: (hour_start, peak, n_boundaries). An hour's peak is
    * max(run, carry) — carry covers an hour whose maximum concurrency was
    * inherited from the previous hour's close.
    */
  def hourlyConcurrency(events: DataFrame): DataFrame = {
    val ev = events
      .select(unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          greatest(lit(1L), floor(col("value")).cast("long")) * lit(1000000L))
          .as("en"))
    val bounds = ev
      .select(explode(array(
        struct(col("st").as("t"), lit(1L).as("d")),
        struct(col("en").as("t"), lit(-1L).as("d")))).as("b"))
      .select(col("b.t").as("t"), col("b.d").as("d"))
      // FLOOR division, not `div`: `div` truncates toward zero, so a
      // pre-1970 timestamp (negative micros) would land one bucket high
      // while the DuckDB mirror's `//` floors — (t − pmod(t, H)) is an
      // exact multiple of H, where truncation ≡ floor for any sign
      .withColumn("bucket", expr(s"(t - pmod(t, $HourUs)) div $HourUs"))
    val perBucket = bounds.groupBy("bucket")
      .agg(sum(col("d")).as("ds"), count(lit(1)).as("nb"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("carry", coalesce(sum(col("ds")).over(wOff), lit(0L)))
      .select("bucket", "carry", "nb")
    val wRun = Window.partitionBy("bucket").orderBy("t", "d")
    bounds
      .join(broadcast(offsets), "bucket")
      .withColumn("run", col("carry") + sum(col("d")).over(wRun))
      .groupBy("bucket")
      .agg(max(greatest(col("run"), col("carry"))).as("peak"),
        max(col("nb")).as("n_boundaries"))
      .select(timestamp_micros(col("bucket") * lit(HourUs)).as("hour_start"),
        col("peak"), col("n_boundaries"))
      .orderBy("hour_start")
  }
}
