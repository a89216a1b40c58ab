package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate sketches — the sub-linear answers a 100 TB engine reaches for
  * when exact distinct/quantile shuffles get too big. Oracle strategy: a
  * sketch's estimate is engine-specific, so each query emits the EXACT
  * value (oracle-matchable) plus a boolean verdict that the estimate lands
  * inside its published error bound; the oracle asserts the verdict is
  * uniformly true. The bound claim is thus hash-checked, not just spec'd.
  */
object Sketches {

  /** Per-group HyperLogLog++ distinct-count estimate vs exact, with a
    * ±5% verdict (rsd default 0.05). At scale the exact branch disappears
    * and only the one-pass, fixed-memory sketch runs; here the exact value
    * rides along to *prove* the bound.
    */
  def approxDistinct(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .select(col("event_type"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * (3 * rsd)).as("within_bound"))
      .orderBy("event_type")

  /** Count-min-sketch frequency estimation, probe-verified: ONE pass
    * builds a fixed-size CMS over the token stream (order-independent
    * merge — the per-partition sketches sum cell-wise), then the top-k
    * tokens' estimates are probed against their exact counts. CMS never
    * under-counts and over-counts by ≤ eps·N with confidence `conf`; the
    * seed is fixed, so on fixed data the verdict is fully deterministic —
    * the oracle hash-checks the exact counts and the uniformly-true
    * bounds. The sketch itself is KB-sized driver state (like the bloom
    * build); the token stream never collects.
    */
  def countMinTopTokens(spark: org.apache.spark.sql.SparkSession,
      toks: DataFrame, k: Int = 5, eps: Double = 0.001,
      conf: Double = 0.99): DataFrame = {
    import spark.implicits._
    val top = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("token")).limit(k)
      .as[(String, Long)].collect()
    val agg = toks.agg(
      expr(s"count_min_sketch(token, CAST($eps AS DOUBLE), " +
        s"CAST($conf AS DOUBLE), 42)").as("sk"),
      count(lit(1)).as("n")).head
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("sk")))
    val slack = math.ceil(eps * agg.getAs[Long]("n")).toLong
    val rows = top.toSeq.map { case (t, c) =>
      val est = cms.estimateCount(t)
      (t, c, est >= c && est <= c + slack)
    }
    spark.createDataFrame(rows).toDF("token", "cnt", "within_bound")
      .orderBy(desc("cnt"), col("token"))
  }

  /** Sketch-based audience-overlap analysis: |A∪B|, |A∩B|, |A\B| of two
    * event segments' user sets. The union estimate is native HLL (merge of
    * the two segment sketches — the one-pass answer at 100 TB); the
    * intersection comes by inclusion–exclusion est(A)+est(B)−est(A∪B), so
    * its absolute error is bounded by the SUM of the three sketch errors —
    * the verdict uses that compound bound (3·rsd each), judged against the
    * exact values computed alongside. Exact columns hash-match the oracle;
    * the uniformly-true verdicts prove the published bounds hold.
    */
  def setOps(events: DataFrame, typeA: String, typeB: String,
      rsd: Double = 0.05): DataFrame = {
    val inA = col("event_type") === typeA
    val inB = col("event_type") === typeB
    events.filter(inA || inB)
      .agg(
        countDistinct(when(inA, col("user_id"))).as("ex_a"),
        countDistinct(when(inB, col("user_id"))).as("ex_b"),
        countDistinct(col("user_id")).as("ex_union"),
        approx_count_distinct(when(inA, col("user_id")), rsd).as("es_a"),
        approx_count_distinct(when(inB, col("user_id")), rsd).as("es_b"),
        approx_count_distinct(col("user_id"), rsd).as("es_union"))
      .select(
        col("ex_union").as("exact_union"),
        (col("ex_a") + col("ex_b") - col("ex_union")).as("exact_intersect"),
        (col("ex_union") - col("ex_b")).as("exact_only_a"),
        (abs(col("es_union") - col("ex_union")) <=
          col("ex_union") * (3 * rsd)).as("union_ok"),
        (abs((col("es_a") + col("es_b") - col("es_union")) -
          (col("ex_a") + col("ex_b") - col("ex_union"))) <=
          (col("ex_a") + col("ex_b") + col("ex_union")) * (3 * rsd))
          .as("intersect_ok"))
  }

  /** Per-group approximate percentiles (GK sketch, accuracy knob) judged
    * against a ±2-percentile-rank window computed exactly: the estimate
    * for p must lie within [exact(p-0.02), exact(p+0.02)]. Rank windows
    * (not value tolerances) are the right acceptance test for quantile
    * sketches — value error is unbounded on skewed data, rank error isn't.
    */
  def approxQuantiles(events: DataFrame, accuracy: Int = 1000): DataFrame = {
    val ps = Seq(0.5, 0.9)
    val aggs = ps.flatMap { p =>
      val tag = (p * 100).toInt
      Seq(
        percentile_approx(col("value"), lit(p), lit(accuracy)).as(s"approx_p$tag"),
        expr(s"percentile(value, ${p - 0.02})").as(s"lo_p$tag"),
        expr(s"percentile(value, ${math.min(p + 0.02, 1.0)})").as(s"hi_p$tag"))
    }
    events.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type") +: ps.map { p =>
        val tag = (p * 100).toInt
        (col(s"approx_p$tag") >= col(s"lo_p$tag") &&
          col(s"approx_p$tag") <= col(s"hi_p$tag")).as(s"within_p$tag")
      }: _*)
      .orderBy("event_type")
  }

  /** Mergeable-sketch distributivity (Apache DataSketches HLL): per-group
    * sketches unioned then estimated must agree with a single sketch over
    * the whole input — THE property that lets 1000 executors sketch their
    * partitions independently and a tiny reduce merge the results. The
    * union gadget re-buckets registers (HLL_8 target), so once sketches
    * leave sparse mode the two estimates differ at sub-percent order, not
    * bit-for-bit — the verdict checks agreement within 1% (or ±1). Emits
    * the exact distinct count (oracle-matchable) + the verdicts.
    */
  def hllMerge(events: DataFrame): DataFrame = {
    val perGroup = events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_est"),
        countDistinct(col("user_id")).as("exact_distinct"))
    direct.crossJoin(perGroup)
      .select(col("exact_distinct"),
        (abs(col("merged_est") - col("direct_est")) <=
          greatest(col("direct_est") * 0.01, lit(1.0))).as("merge_consistent"),
        (abs(col("direct_est") - col("exact_distinct")) <=
          greatest(col("exact_distinct") * 0.05, lit(16.0))).as("within_bound"))
  }
}
