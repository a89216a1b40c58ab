package graft

import graft.core.Tables
import graft.ops.Sketches

class SketchesSpec extends SparkSpec {

  test("HLL distinct estimates stay inside the bound and are deterministic") {
    val events = Tables.read(spark, sf, "events")
    val once = Sketches.approxDistinct(events).collect()
    assert(once.nonEmpty)
    assert(once.forall(_.getBoolean(2)), "estimate escaped its ±3·rsd bound")
    val twice = Sketches.approxDistinct(events).collect()
    assert(once.map(_.toSeq).toSeq === twice.map(_.toSeq).toSeq)
  }

  test("approx percentiles land inside a ±2-rank window of the exact quantiles") {
    val rows = Sketches.approxQuantiles(Tables.read(spark, sf, "events")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2), s"group ${r.getString(0)}")
    }
  }

  test("unioned per-group HLL sketches estimate identically to one direct sketch") {
    val r = Sketches.hllMerge(Tables.read(spark, sf, "events")).collect().head
    assert(r.getBoolean(1), "per-group union disagreed with the direct sketch")
    assert(r.getBoolean(2), "direct estimate escaped its bound")
  }

  test("count-min never under-counts ANY token and bounds the overshoot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val toks = graft.ops.TextOps.withTokens(
      Tables.read(spark, sf, "documents"))
      .select(explode(col("t")).as("token"))
    val exact = toks.groupBy("token").count().as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val agg = toks.agg(expr(
      "count_min_sketch(token, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)")).head
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]](0)))
    val slack = math.ceil(0.001 * n).toLong
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"under-count for '$t': $est < $c")
      assert(est <= c + slack, s"overshoot for '$t': $est > $c + $slack")
    }
  }
}
