package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftFunctions, Tables}
import graft.plans.RangeBinJoin

/** Measures the RangeBinJoin rule's value claim at the scale it exists
  * for: a LARGE interval table. The declared `join_range_*` queries use a
  * 10-row band table, where a broadcast nested loop is floor-bound and
  * the rule can't show a win (PLANS.md round-11 addendum) — this tool
  * joins the events table against `nIntervals` synthetic bands covering
  * the same value domain and times the identical aggregate with the rule
  * off (Spark's only plan: BNLJ, points × intervals comparisons) vs on
  * (hash join on the generated bin key). Result checksums must match —
  * the rewrite is strategy-only.
  *
  * Usage: RangeJoinBench [sfDir] [nIntervals] [binWidth]
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nIv = args.lift(1).map(_.toInt).getOrElse(10000)
    val binW = args.lift(2).getOrElse("0.125")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.ensureRegistered(spark)

    // events.value spans ~[0, 1000); nIv equal bands of that domain, so
    // every point matches exactly one interval and the output cardinality
    // is the event count regardless of nIv (what moves is the COMPARISON
    // volume: BNLJ does points x nIv, the binned join ~points x 1).
    val width = 1000.0 / nIv
    val points = Tables.read(spark, dir, "events")
      .select(col("event_id"), col("value")).localCheckpoint()
    val intervals = spark.range(0, nIv).select(
      col("id").as("band_id"),
      (col("id") * width).as("lo"),
      ((col("id") + 1) * width).as("hi")).localCheckpoint()

    def run(): (Long, Long, Double) = {
      val j = points.join(intervals,
          col("value") >= col("lo") && col("value") < col("hi"))
        .agg(count(lit(1)).as("n"),
          sum(hash(col("event_id"), col("band_id"))).as("chk"))
      val t0 = System.nanoTime()
      val r = j.head()
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    spark.conf.unset(RangeBinJoin.BinSizeKey)
    run() // warmup (codegen, parquet footers)
    val (nOff, chkOff, tOff) = run()
    spark.conf.set(RangeBinJoin.BinSizeKey, binW)
    run() // warmup the binned plan
    val (nOn, chkOn, tOn) = run()
    require(nOff == nOn && chkOff == chkOn,
      s"rule changed results: off=($nOff,$chkOff) on=($nOn,$chkOn)")
    println(s"""{"tool":"range_join_bench","sf_dir":"$dir",""" +
      s""""n_intervals":$nIv,"bin_width":$binW,"rows":$nOff,""" +
      s""""sec_rule_off_bnlj":${f"$tOff%.2f"},""" +
      s""""sec_rule_on_binned":${f"$tOn%.2f"},""" +
      s""""speedup":${f"${tOff / tOn}%.1f"}}""")
    spark.stop()
  }
}
