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
}
