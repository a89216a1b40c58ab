package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamJoins

/** Stream-stream join and within-watermark dedup: the streaming pass over
  * the same files must reproduce the batch semantics exactly.
  */
class StreamJoinSpec extends SparkSpec {

  test("watermarked stream-stream interval join equals the batch join") {
    val q = StreamJoins.clickPurchaseStreaming(
      spark, sf, "events.parquet", "stream_join_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT user_id, c_id, p_id FROM stream_join_out")
      .collect().map(_.toSeq).toSet
    val batch = StreamJoins.clickPurchaseBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("dropDuplicatesWithinWatermark collapses duplicate event ids") {
    import org.apache.spark.sql.functions._
    graft.core.GraftFunctions.ensureRegistered(spark)
    val rawSchema = spark.read
      .parquet(graft.core.Tables.path(sf, "events")).schema
    def load() = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .format("parquet")
      .load(sf)
      .transform(graft.core.Catalog.rebuildTs(_, "ts"))
    // union the stream with itself: every event arrives twice
    val doubled = load().union(load())
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = doubled.select("event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_ddww_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM stream_ddww_out")
      .collect().head
    val total = graft.core.Tables.read(spark, sf, "events").count()
    assert(streamed.getLong(0) === total)   // each id exactly once
    assert(streamed.getLong(1) === total)
  }
}
