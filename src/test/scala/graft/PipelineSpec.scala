package graft

import org.apache.hadoop.fs.Path

import graft.pipeline.{Backfill, Pipeline}

/** End-to-end DAG smoke (SURVEY §5.4): full pipeline over sf0.001, fact row
  * counts and surrogate-FK coverage.
  */
class PipelineSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_pipe_$tag"
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(p), true)
    p
  }

  test("full pipeline: fact written with 100% FK coverage") {
    val out = freshDir("e2e")
    val counts = Pipeline.run(spark,
      Pipeline.Config(sf, out, "1992-01-01", "1999-01-01"))
    assert(counts("fact_lineitem") > 0)
    assert(counts("dim_time") === 1440)
    val fact = Pipeline.table(spark, out, "fact_lineitem")
    val n = fact.count()
    assert(n === counts("fact_lineitem"))
    // every fact row found its dim keys (dims built from the same slice)
    Seq("part_key", "supplier_key", "nation_key").foreach { k =>
      assert(fact.filter(fact(k).isNull).count() === 0, s"null $k")
    }
    // second fact domain + integrated fact (reference main.py:148-181,
    // load_integrated_fact.py)
    val orders = Pipeline.table(spark, out, "fact_orders")
    assert(counts("fact_orders") === orders.count() && orders.count() > 0)
    Seq("prio_key", "segment_key").foreach { k =>
      assert(orders.filter(orders(k).isNull).count() === 0, s"null $k")
    }
    val integrated = Pipeline.table(spark, out, "fact_integrated")
    assert(integrated.count() === counts("fact_lineitem") + counts("fact_orders"))
    assert(integrated.select("domain").distinct().count() === 2)
  }

  test("append-duplication quirk: dims accumulate across runs (§2.8)") {
    val out = freshDir("quirk")
    Pipeline.run(spark, Pipeline.Config(sf, out, "1995-01-01", "1996-01-01"))
    val once = Pipeline.table(spark, out, "dim_nation").count()
    Pipeline.run(spark, Pipeline.Config(sf, out, "1995-01-01", "1996-01-01"))
    val twice = Pipeline.table(spark, out, "dim_nation").count()
    assert(twice === once * 2) // per-slice dedup only, append sink
  }

  test("idempotent dim upsert: re-running a slice adds no dim rows") {
    val out = freshDir("idem")
    val cfg = Pipeline.Config(sf, out, "1995-01-01", "1996-01-01",
      idempotentDims = true)
    Pipeline.run(spark, cfg)
    val once = Pipeline.table(spark, out, "dim_nation").count()
    Pipeline.run(spark, cfg)
    val twice = Pipeline.table(spark, out, "dim_nation").count()
    assert(twice === once)
  }

  test("fact lands partitioned by ship_year") {
    val out = freshDir("part")
    Pipeline.run(spark, Pipeline.Config(sf, out, "1995-01-01", "1997-01-01"))
    val dirs = new java.io.File(s"$out/fact_lineitem").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ship_year="))
    assert(dirs.toSet === Set("ship_year=1995", "ship_year=1996"))
  }

  test("backfill slices a range into month windows") {
    val slices = Backfill.monthSlices("1995-01-15", "1995-04-01")
    assert(slices === Seq(
      ("1995-01-01", "1995-02-01"),
      ("1995-02-01", "1995-03-01"),
      ("1995-03-01", "1995-04-01")))
  }

  test("CLI main runs a slice end-to-end from argv") {
    val out = freshDir("cli")
    graft.pipeline.Main.main(Array(
      "--sf", sf, "--out", out,
      "--start", "1995-01-01", "--end", "1996-01-01"))
    assert(Pipeline.table(spark, out, "fact_lineitem").count() > 0)
    assert(Pipeline.table(spark, out, "dim_time").count() === 1440)
  }

  test("CLI main rejects missing and unknown flags") {
    intercept[IllegalArgumentException] {
      graft.pipeline.Main.parse(Seq("--sf", "x", "--out", "y", "--start", "z"))
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Main.parse(Seq("--bogus"))
    }
  }
}
