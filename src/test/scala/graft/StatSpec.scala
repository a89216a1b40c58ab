package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-12 fourth wave (StatQueries): definitional identities the oracle
  * hash can't articulate — KM monotonicity/censoring accounting, lift-table
  * conservation, Theil decomposition vs a driver-side brute force, and
  * Mann-Kendall's S/variance recomputed pairwise in plain Scala.
  */
class StatSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("events_survival: KM curve is a valid survival function") {
    val rows = run("events_survival").collect()
    assert(rows.nonEmpty, "the life table must have death events")
    val surv = rows.map(_.getAs[Double]("survival")).toSeq
    val nRisk = rows.map(_.getAs[Long]("n_risk")).toSeq
    val t = rows.map(_.getAs[Long]("t_days")).toSeq
    assert(t === t.sorted, "ordered by duration")
    assert(surv === surv.sorted.reverse, "survival is non-increasing")
    assert(surv.forall(v => v >= 0.0 && v <= 1.0))
    assert(nRisk === nRisk.sorted.reverse, "risk set shrinks over time")
    assert(rows.forall(_.getAs[Long]("deaths") >= 1L),
      "life-table rows are event times only")
    // censoring accounting: deaths never exceed the users at risk
    assert(rows.forall(r => r.getAs[Long]("deaths") <= r.getAs[Long]("n_risk")))
  }

  test("eval_lift: decile table conserves the scored frame; gains close " +
    "at 100%") {
    val rows = run("eval_lift").collect()
    val n = Tables.read(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view") &&
        col("value").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n")).sum === n,
      "deciles partition the scored frame")
    assert(rows.map(_.getAs[Long]("decile")).toSeq ===
      rows.map(_.getAs[Long]("decile")).toSeq.sorted)
    assert(rows.forall(r => r.getAs[Long]("decile") >= 1 &&
      r.getAs[Long]("decile") <= 10))
    val gains = rows.map(_.getAs[Long]("gain_bp")).toSeq
    assert(gains === gains.sorted, "cumulative gain is non-decreasing")
    assert(gains.last === 10000L, "the last decile captures every positive")
    assert(rows.last.getAs[Long]("lift_bp") === 10000L,
      "full-population lift is exactly 1x")
  }

  test("agg_theil: decomposition matches a driver-side brute force and " +
    "total = between + within") {
    val row = run("agg_theil").collect().head
    // brute force on the tiny SF: exact same population (order values
    // joined to regions), plain Scala doubles
    val xs = Tables.read(spark, sf, "orders").select("o_custkey", "o_totalprice")
      .join(Tables.read(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.read(spark, sf, "nation").select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.read(spark, sf, "region").select("r_regionkey", "r_name"),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = xs.length
    val mu = xs.map(_._2).sum / n
    val tTotal = xs.map { case (_, x) => (x / mu) * math.log(x / mu) }.sum / n
    val byG = xs.groupBy(_._1).values.map { g =>
      val mug = g.map(_._2).sum / g.length
      (g.map(_._2).sum / xs.map(_._2).sum) * math.log(mug / mu)
    }
    val tBetween = byG.sum
    assert(row.getAs[Long]("n_orders") === n.toLong)
    assert(math.abs(row.getAs[Double]("theil_total") - tTotal) < 1e-4,
      s"engine ${row.getAs[Double]("theil_total")} vs brute $tTotal")
    assert(math.abs(row.getAs[Double]("theil_between") - tBetween) < 1e-4)
    assert(math.abs(row.getAs[Double]("theil_within") -
      (row.getAs[Double]("theil_total") -
        row.getAs[Double]("theil_between"))) < 1e-5,
      "additive decomposition identity")
    assert(row.getAs[Double]("theil_between") >= 0.0 ||
      math.abs(row.getAs[Double]("theil_between")) < 1e-9)
  }

  test("ts_mann_kendall: S and tie-corrected variance match a pairwise " +
    "brute force") {
    val rows = run("ts_mann_kendall").collect()
    val daily = Tables.read(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    for (row <- rows) {
      val et = row.getString(0)
      val series = daily.filter(_._1 == et).sortBy(_._2).map(_._3).toSeq
      val nD = series.length
      var sStat = 0L
      for (i <- series.indices; j <- (i + 1) until nD)
        sStat += java.lang.Long.signum(series(j) - series(i))
      val ties = series.groupBy(identity).values.map(_.length.toLong)
        .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = nD.toLong * (nD - 1) * (2L * nD + 5) - ties
      assert(row.getAs[Long]("n_days") === nD.toLong, s"$et n_days")
      assert(row.getAs[Long]("s_stat") === sStat, s"$et S")
      assert(row.getAs[Long]("var18") === var18, s"$et var18")
      val zExpect =
        if (sStat > 0) (sStat - 1.0) / math.sqrt(var18 / 18.0)
        else if (sStat < 0) (sStat + 1.0) / math.sqrt(var18 / 18.0)
        else 0.0
      assert(math.abs(row.getAs[Double]("z_score") - zExpect) < 1e-5, s"$et z")
    }
  }

  test("profile_skew: census matches a collected recount") {
    val row = run("profile_skew").collect().head
    val counts = Tables.read(spark, sf, "lineitem")
      .groupBy("l_suppkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nRows = counts.map(_._2).sum
    val maxCnt = counts.map(_._2).max
    val top10 = counts.sortBy { case (k, c) => (-c, k) }.take(10).map(_._2).sum
    assert(row.getAs[Long]("n_rows") === nRows)
    assert(row.getAs[Long]("n_keys") === counts.length.toLong)
    assert(row.getAs[Long]("max_cnt") === maxCnt)
    assert(row.getAs[Long]("top1_bp") === maxCnt * 10000 / nRows)
    assert(row.getAs[Long]("top10_bp") === top10 * 10000 / nRows)
    assert(row.getAs[Long]("skew_x_bp") ===
      maxCnt * counts.length * 10000 / nRows)
  }

  test("curation_dp_counts: noise is Laplace-bounded, deterministic, and " +
    "never exposes the exact count") {
    val a = run("curation_dp_counts").collect()
    val b = run("curation_dp_counts").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "the seeded mechanism is deterministic")
    val truth = Tables.read(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- a) {
      val noisy = r.getAs[Double]("noisy_count")
      val t = truth(r.getString(0)).toDouble
      // the 52-bit uniform bounds |noise| by ln(2^52)/eps ~= 36.05
      assert(math.abs(noisy - t) <= 37.0, s"${r.getString(0)}: $noisy vs $t")
      assert(noisy != t, "noise must actually perturb the count")
    }
  }

  test("text_zipf_fit: top-100 vocab fits a negative power law") {
    val r = run("text_zipf_fit").collect().head
    // the tiny SF's vocabulary is smaller than the 100-term cap
    assert(r.getAs[Long]("n_terms") >= 10L &&
      r.getAs[Long]("n_terms") <= 100L)
    assert(r.getAs[Double]("zipf_slope") < 0.0,
      "frequency must fall with rank")
    assert(r.getAs[Double]("intercept") > 0.0)
  }

  test("text_sentence_stats: every sentence has a word; avg is the exact " +
    "centi-word ratio") {
    val rows = run("text_sentence_stats").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nSent = r.getAs[Long]("n_sentences")
      val total = r.getAs[Long]("total_words")
      assert(nSent >= 1L)
      assert(total >= nSent, "a kept sentence has at least one word")
      assert(r.getAs[Long]("avg_words_c") === total * 100 / nSent)
      assert(r.getAs[Long]("max_words") <= total)
    }
  }
}
