package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-series forecasting / periodicity primitives over resampled event
  * streams (extension surface, SURVEY §7.6). Both operators first collapse
  * the raw stream to one row per (series, day) — a map-side-combinable
  * count — so the stateful/sequential part only ever sees the BOUNDED
  * resampled series (≤ horizon days), never the raw 100 TB event stream.
  */
object Forecast {

  /** Holt's linear (double-exponential) smoothing per series, h-step
    * forecast. Sequential by nature, so the recurrence runs as an
    * `aggregate` fold over the series' day-ordered count array — one
    * array per series, parallel ACROSS series, state O(1) per series.
    * That is the right 100 TB shape: resample distributes, the fold
    * touches ≤ |days| elements per group.
    *
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = y_1, b_1 = y_2 − y_1
    *
    * α = 0.5 and β = 0.25 are exactly representable doubles, and the fold
    * order is the day order in BOTH engines (the oracle's recursive CTE
    * walks the identical recurrence), so the smoothed state is
    * bit-identical before the final 6 dp rounding.
    *
    * Returns (series, h, yhat) for h = 1..horizon with
    * yhat = level + h·trend.
    */
  def holtForecast(daily: DataFrame, seriesCol: String, dayCol: String,
                   yCol: String, horizon: Int = 7): DataFrame = {
    val series = daily
      .groupBy(seriesCol)
      .agg(array_sort(collect_list(struct(col(dayCol).as("day"),
        col(yCol).cast("double").as("y")))).as("s"))
      .filter(size(col("s")) >= 2)
      .select(col(seriesCol), transform(col("s"), _.getField("y")).as("ys"))
    val level0 = element_at(col("ys"), 1)
    val trend0 = element_at(col("ys"), 2) - element_at(col("ys"), 1)
    val folded = aggregate(
      slice(col("ys"), lit(2), size(col("ys")) - 1),
      struct(level0.as("level"), trend0.as("trend")),
      (acc: Column, y: Column) => {
        // lNew appears twice (also inside the trend update) — duplicated
        // deterministic subexpression, mirrored verbatim in the oracle SQL
        val lNew = lit(0.5) * y +
          lit(0.5) * (acc.getField("level") + acc.getField("trend"))
        struct(lNew.as("level"),
          (lit(0.25) * (lNew - acc.getField("level")) +
            lit(0.75) * acc.getField("trend")).as("trend"))
      })
    series.select(col(seriesCol), folded.as("st"))
      .select(col(seriesCol), col("st.level").as("level"),
        col("st.trend").as("trend"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .select(col(seriesCol), col("h").cast("long").as("h"),
        round(col("level") + col("h") * col("trend"), 6).as("yhat"))
      .orderBy(seriesCol, "h")
  }

  /** Holt-Winters additive seasonal smoothing per series (period m),
    * h-step forecast — [[holtForecast]] plus a rolling m-slot seasonal
    * state riding the same `aggregate` fold:
    *
    *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − l_{t−1} − b_{t−1}) + (1−γ)s_{t−m}
    *
    * Init is the textbook two-cycle form: l_m = mean(first cycle),
    * b_m = (mean(second) − mean(first))/m, s_i = y_i − l_m — every mean
    * an EXPLICIT left-associated chain of element adds so the oracle's
    * recursive CTE reproduces the identical double at every step
    * (α = 0.5, β = γ = 0.25 are exact binary fractions, the
    * holtForecast determinism discipline). Forecast
    * yhat_{n+h} = l_n + h·b_n + s_{n+h−m} for h = 1..m. State O(m) per
    * series, fold ≤ |days| elements — the raw stream never reaches the
    * sequential part.
    */
  def holtWinters(daily: DataFrame, seriesCol: String, dayCol: String,
                  yCol: String, period: Int = 7): DataFrame = {
    val m = period
    val series = daily
      .groupBy(seriesCol)
      .agg(array_sort(collect_list(struct(col(dayCol).as("day"),
        col(yCol).cast("double").as("y")))).as("s"))
      .filter(size(col("s")) >= 2 * m)
      .select(col(seriesCol), transform(col("s"), _.getField("y")).as("ys"))
    def chainMean(offset: Int): Column =
      (1 until m).foldLeft(element_at(col("ys"), offset + 1))(
        (acc, i) => acc + element_at(col("ys"), offset + i + 1)) / m
    val l0 = chainMean(0)
    val b0 = (chainMean(m) - chainMean(0)) / m
    val seas0 = transform(slice(col("ys"), 1, m), y => y - l0)
    val folded = aggregate(
      slice(col("ys"), lit(m + 1), size(col("ys")) - m),
      struct(l0.as("level"), b0.as("trend"), seas0.as("seas")),
      (acc: Column, y: Column) => {
        val level = acc.getField("level")
        val trend = acc.getField("trend")
        val seas = acc.getField("seas")
        val sOld = element_at(seas, 1)
        val lNew = lit(0.5) * (y - sOld) + lit(0.5) * (level + trend)
        val bNew = lit(0.25) * (lNew - level) + lit(0.75) * trend
        val sNew = lit(0.25) * (y - level - trend) + lit(0.75) * sOld
        struct(lNew.as("level"), bNew.as("trend"),
          concat(slice(seas, 2, m - 1), array(sNew)).as("seas"))
      })
    series.select(col(seriesCol), folded.as("st"))
      .select(col(seriesCol), col("st.level").as("level"),
        col("st.trend").as("trend"), col("st.seas").as("seas"),
        explode(sequence(lit(1), lit(m))).as("h"))
      .select(col(seriesCol), col("h").cast("long").as("h"),
        round(col("level") + col("h") * col("trend") +
          element_at(col("seas"), col("h")), 6).as("yhat"))
      .orderBy(seriesCol, "h")
  }

  /** Rolling-origin backtest of the Holt forecaster — the MLOps loop that
    * decides whether a forecaster is deployable: every prefix fold of the
    * recurrence IS the model fit on that prefix, so the same single
    * `aggregate` fold that fits the series also evaluates it — at each
    * step the PRE-update state forecasts the incoming observation, and
    * the last `lastK` one-step errors ride the accumulator as a bounded
    * array. One pass, no per-cutoff refits, state O(lastK) per series.
    *
    * Errors are 6-dp-rounded AT CAPTURE and decimal-summed after the
    * explode, so MAE/bias are order-independent and oracle-exact (the
    * oracle reuses the holt recursive CTE, whose UNION ALL already
    * retains every prefix state).
    */
  def holtBacktest(daily: DataFrame, seriesCol: String, dayCol: String,
                   yCol: String, lastK: Int = 7): DataFrame = {
    val series = daily
      .groupBy(seriesCol)
      .agg(array_sort(collect_list(struct(col(dayCol).as("day"),
        col(yCol).cast("double").as("y")))).as("s"))
      .filter(size(col("s")) >= 2)
      .select(col(seriesCol), transform(col("s"), _.getField("y")).as("ys"))
      .withColumn("n", size(col("ys")).cast("long"))
    val init = struct(
      element_at(col("ys"), 1).as("level"),
      (element_at(col("ys"), 2) - element_at(col("ys"), 1)).as("trend"),
      lit(1L).as("i"),
      expr("CAST(array() AS ARRAY<DOUBLE>)").as("errs"))
    val folded = aggregate(
      slice(col("ys"), lit(2), size(col("ys")) - 1),
      init,
      (acc: Column, y: Column) => {
        val f = acc.getField("level") + acc.getField("trend")
        val lNew = lit(0.5) * y + lit(0.5) * f
        val tNew = lit(0.25) * (lNew - acc.getField("level")) +
          lit(0.75) * acc.getField("trend")
        val errs = when(acc.getField("i") + 1 > col("n") - lastK,
            concat(acc.getField("errs"), array(round(f - y, 6))))
          .otherwise(acc.getField("errs"))
        struct(lNew.as("level"), tNew.as("trend"),
          (acc.getField("i") + 1).as("i"), errs.as("errs"))
      })
    series.select(col(seriesCol), explode(folded.getField("errs")).as("err"))
      .groupBy(seriesCol)
      .agg(count(lit(1)).as("n_evals"),
        round(sum(abs(col("err")).cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mae"),
        round(sum(col("err").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("bias"))
      .orderBy(seriesCol)
  }

  /** Seasonality-strength scan (trig-free periodogram): for each candidate
    * period p, fold the day index modulo p and measure the fraction of
    * total variance explained by the per-phase means — the one-way-ANOVA
    * ratio SS_between / SS_total. A dominant period shows up as the
    * arg-max strength without any sin/cos (whose last-ulp engine drift
    * would break the hash gate).
    *
    * All inputs to the final closed-form doubles are EXACT integer sums
    * (daily counts), so the only cross-engine hazard is the per-phase term
    * s1²/n — identical double division in both engines — decimal-summed
    * after a 6 dp round so the Σ over phases is order-independent.
    *
    * Scale: |days| × |periods| intermediate rows (tiny after the daily
    * resample); both aggregations are map-side combinable.
    */
  def periodStrength(daily: DataFrame, dCol: String, yCol: String,
                     maxPeriod: Int = 14): DataFrame = {
    val y = col(yCol)
    val g = daily.agg(sum(y).cast("double").as("sy"),
      sum(y * y).cast("double").as("syy"),
      count(lit(1)).cast("double").as("n"))
    val ph = daily
      .select(explode(sequence(lit(2), lit(maxPeriod))).as("p"),
        col(dCol), y.as("y"))
      .groupBy(col("p"), pmod(col(dCol), col("p")).as("phase"))
      .agg(sum(col("y")).cast("double").as("s1"),
        count(lit(1)).cast("double").as("cnt"))
    val bt = ph.groupBy("p")
      .agg(sum(round(col("s1") * col("s1") / col("cnt"), 6)
        .cast("decimal(28,6)")).cast("double").as("ssb"))
    // zero-variance guard: a constant series has syy − sy²/n = 0, where
    // Spark (non-ANSI) division returns NULL but IEEE engines return
    // inf/NaN — the explicit when() pins NULL in BOTH (oracle: nullif)
    val denom = col("syy") - col("sy") * col("sy") / col("n")
    bt.crossJoin(broadcast(g))
      .select(col("p").cast("long").as("period"),
        round((col("ssb") - col("sy") * col("sy") / col("n")) /
          when(denom =!= 0.0, denom), 6).as("strength"))
      .orderBy("period")
  }
}
