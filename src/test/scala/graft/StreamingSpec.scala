package graft

import graft.streaming.Streams

/** Structured Streaming parity: the same windowedAgg transform must produce
  * identical aggregates whether driven as a batch or as a file-source stream
  * (SURVEY §2.8 — the reference's daily-batch model as the degenerate
  * streaming case).
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg equals the batch transform") {
    val q = Streams.runStreaming(spark, sf, "stream_spec_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT window_start, event_type, n_events, sum_value FROM stream_spec_out")
      .collect().map(_.toSeq).toSet
    val batch = Streams.windowedAggBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}

/** Driver-contract sanity: every declared query runs on sf0.001, every
  * oracle key points at a declared query, and the flagship entry is
  * non-empty (the driver's smoke check).
  */
class QueriesSpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("entry (flagship star build) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
