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

  test("streaming enrich prunes files on EVERY trigger and reuses the " +
    "parsed manifest across triggers") {
    import spark.implicits._
    val table = fresh("stream_table")
    val src = fresh("stream_src")
    val out = fresh("stream_out")
    // 8 range-clustered files over k = 0..799
    val fact = spark.range(800).select(col("id").as("k"),
      (col("id") * 3).as("v"))
    Sink.overwrite(fact.repartitionByRange(8, col("k")), table,
      format = "graft-warehouse")
    // two source files with narrow, disjoint key ranges — each trigger's
    // key set can only touch 1-2 of the 8 zone files. The part files move
    // to the source ROOT (flat layout, one file per trigger).
    val fs = graft.sources.WarehouseMeta.fs(src)
    var i = 0
    for ((ks, tag) <- Seq((Seq(10L, 15L, 110L), "a"),
        (Seq(705L, 790L), "b"))) {
      ks.toDF("k").withColumn("tag", lit(tag))
        .repartition(1).write.parquet(s"$src/_stage$i")
      for (st <- fs.listStatus(new org.apache.hadoop.fs.Path(s"$src/_stage$i"))
           if st.getPath.getName.endsWith(".parquet"))
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(s"$src/s$i.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$src/_stage$i"), true)
      i += 1
    }
    WarehouseScanStats.plannedLog.clear()
    val hits0 = graft.sources.WarehouseMeta.manifestCacheHits
    val q = graft.streaming.Streams.warehouseEnrichStream(spark, src,
      table, batchKey = "k", tableKey = "k", outPath = out)
    q.awaitTermination()
    // results identical to the batch join
    val got = spark.read.parquet(out)
      .select(col("tag"), col("k"), col("v")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 10L, 30L), ("a", 15L, 45L),
      ("a", 110L, 330L), ("b", 705L, 2115L), ("b", 790L, 2370L)))
    // EVERY trigger's warehouse scan planned fewer than the 8 files
    // (and something: the join matched rows), proven from the rolling log
    val planned = {
      val it = WarehouseScanStats.plannedLog.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[Int]()
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
    assert(planned.size >= 2, s"expected >=2 trigger scans, saw $planned")
    assert(planned.forall(p => p >= 1 && p < 8),
      s"every trigger must prune zone files: $planned")
    // the second trigger re-planned from the cached manifest parse
    assert(graft.sources.WarehouseMeta.manifestCacheHits > hits0,
      "a steady generation must not re-parse the manifest per trigger")
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
