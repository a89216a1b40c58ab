package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.RangeBinJoin

/** The range-join auto-binning rule: with the bin-size hint set, a pure
  * point-in-interval join must plan as a hash join on the generated bin
  * key (never a nested-loop over every pair), with results identical to
  * the rule-off plan — the rewrite is strategy-only.
  */
class RangeBinJoinSpec extends SparkSpec {

  private def rangeJoin() = {
    val bands = spark.range(0, 10).select(
      col("id").as("band_id"),
      (col("id") * 50.0d).as("lo"),
      ((col("id") + 1) * 50.0d).as("hi"))
    Tables.read(spark, sf, "events")
      .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("band_id"))
  }

  private def withBin[T](w: String)(f: => T): T = {
    spark.conf.set(RangeBinJoin.BinSizeKey, w)
    try f finally spark.conf.unset(RangeBinJoin.BinSizeKey)
  }

  test("rule off: inert; rule on: equi join on the generated bin key") {
    val off = rangeJoin().queryExecution.optimizedPlan.toString
    assert(!off.contains("graft_range_bin"), off)
    withBin("32") {
      val on = rangeJoin().queryExecution
      val opt = on.optimizedPlan.toString
      assert(opt.contains("graft_range_bin"), opt)
      // the planner must extract the bin equality as a hash-join key:
      // no nested-loop join survives anywhere in the physical plan
      val phys = on.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(phys.contains("Join") || phys.contains("HashJoin"), phys)
    }
  }

  test("rewrite is strategy-only: results identical, bin width irrelevant") {
    val want = rangeJoin().orderBy("event_id", "band_id").collect().toSeq
    assert(want.nonEmpty)
    for (w <- Seq("32", "7.5", "500")) {
      val got = withBin(w) {
        rangeJoin().orderBy("event_id", "band_id").collect().toSeq
      }
      assert(got === want, s"bin width $w changed results")
    }
  }

  test("guards: equi-joins and one-sided ranges are left alone") {
    withBin("32") {
      // an equi conjunct present: already hash-joinable, no rewrite
      val bands = spark.range(0, 5).select(col("id").as("k"),
        (col("id") * 100.0d).as("lo"), ((col("id") + 1) * 100.0d).as("hi"))
      val equi = Tables.read(spark, sf, "events")
        .join(bands, pmod(col("user_id"), lit(5)) === col("k") &&
          col("value") >= col("lo") && col("value") < col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("graft_range_bin"))
      // only an upper bound: binning could not cover, no rewrite
      val oneSided = Tables.read(spark, sf, "events")
        .join(bands, col("value") < col("hi"))
      assert(!oneSided.queryExecution.optimizedPlan.toString
        .contains("graft_range_bin"))
    }
  }

  test("bin-count guard: an interval spanning too many bins fails loudly") {
    // events values live in [0, 500): at width 1e-6 one 50-wide band is
    // 5e7 bins — past the cap set here, so execution must fail with the
    // guard's message (naming both confs), NOT an opaque Sequence
    // max-array error or an executor OOM.
    spark.conf.set(RangeBinJoin.MaxBinsKey, "1000")
    try {
      val ex = intercept[Exception] {
        withBin("0.000001")(rangeJoin().count())
      }
      val msg = Option(ex.getMessage).getOrElse("") +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("spans more than 1000 bins") ||
        msg.contains(RangeBinJoin.BinSizeKey), msg)
      // and a width that fits the cap still runs and matches rule-off
      val want = rangeJoin().orderBy("event_id", "band_id").collect().toSeq
      val got = withBin("32") {
        rangeJoin().orderBy("event_id", "band_id").collect().toSeq
      }
      assert(got === want)
    } finally spark.conf.unset(RangeBinJoin.MaxBinsKey)
    // a malformed cap is as defensively parsed as the width hint
    spark.conf.set(RangeBinJoin.MaxBinsKey, "huge")
    try withBin("32") {
      assert(!rangeJoin().queryExecution.optimizedPlan.toString
        .contains("graft_range_bin"), "bad cap should leave the rule inert")
    } finally spark.conf.unset(RangeBinJoin.MaxBinsKey)
  }

  test("malformed or non-positive hint leaves the session usable (inert)") {
    val want = rangeJoin().orderBy("event_id", "band_id").collect().toSeq
    // the rule runs on EVERY query while installed: a bad hint must never
    // throw inside the optimizer, only fall back to the untouched plan
    for (w <- Seq("not-a-number", "-3", "0", "NaN", "Infinity")) {
      val got = withBin(w) {
        val q = rangeJoin()
        assert(!q.queryExecution.optimizedPlan.toString
          .contains("graft_range_bin"), s"hint '$w' should be inert")
        q.orderBy("event_id", "band_id").collect().toSeq
      }
      assert(got === want, s"hint '$w' changed results")
    }
  }
}
