package graft

import org.apache.spark.sql.functions._

import graft.io.Sink
import graft.sources.WarehouseScanStats

/** DSv2 runtime (DPP-style) file pruning: a selective broadcast build
  * side delivers its key set to the warehouse scan AT EXECUTION, and the
  * zone maps drop whole files dynamically — planned files fall below the
  * total while results stay identical to the unfiltered join.
  */
class WarehouseRuntimeFilterSpec extends SparkSpec {

  private def fresh(tag: String): String =
    s"/tmp/graft_wh_rtf_${tag}_${System.nanoTime()}"

  test("a broadcast join's key set prunes warehouse files at runtime") {
    import spark.implicits._
    val path = fresh("fact")
    // 8 range-clustered files over k = 0..799: file i holds [i*100, i*100+99]
    val fact = spark.range(800).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    Sink.overwrite(fact.repartitionByRange(8, col("k")), path,
      format = "graft-warehouse")

    // dim touches only two zones (k = 5 and k = 750) — selected via a
    // NON-join column so Catalyst can't fold the keys into a static
    // predicate on the fact side: only runtime pruning can drop files
    val dim = spark.range(1000).select(col("id").as("k"),
        (col("id") % 745).as("grp"))
      .filter(col("grp") === 5L) // -> k in {5, 750}
    val joined = Sink.read(spark, path, "graft-warehouse")
      .join(broadcast(dim), "k")
      .orderBy("k")
      .collect()
    assert(joined.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((5L, 10L, 5L), (750L, 1500L, 5L)))
    assert(WarehouseScanStats.lastRuntimeFilters >= 1,
      "the DPP In-filter must reach the scan")
    assert(WarehouseScanStats.lastPlannedFiles < 8,
      s"runtime pruning must drop zone files " +
        s"(planned ${WarehouseScanStats.lastPlannedFiles} of 8)")
  }

  test("runtime pruning never changes results: full-domain build side " +
    "keeps every file") {
    import spark.implicits._
    val path = fresh("full")
    val fact = spark.range(200).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    Sink.overwrite(fact.repartitionByRange(4, col("k")), path,
      format = "graft-warehouse")
    val dim = spark.range(400).select(col("id").as("k"),
        (col("id") % 2).as("grp"))
      .filter(col("grp").isin(0L, 1L)) // selects every key
    val n = Sink.read(spark, path, "graft-warehouse")
      .join(broadcast(dim), "k").count()
    assert(n === 200L)
    assert(WarehouseScanStats.lastPlannedFiles === 4,
      "a non-selective key set proves no file empty")
  }
}
