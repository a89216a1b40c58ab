package graft

import org.apache.spark.sql.streaming.Trigger

import graft.ops.Blocklist

/** Streaming face of the blocklist census: the IDENTICAL
  * Blocklist.census transform (automaton mask + monoid shift/mask
  * aggregates) driven as a complete-mode file-source stream must emit
  * exactly the batch result — the live-ingestion safety-screen shape.
  */
class BlocklistStreamSpec extends SparkSpec {

  test("streaming blocklist census equals the batch census") {
    graft.core.GraftFunctions.ensureRegistered(spark)
    val phrases = Seq("fast table", "table table", "scan query",
      "slow filter", "key agg", "spark a")
    val schema = spark.read
      .parquet(graft.core.Tables.path(sf, "documents")).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .format("parquet")
      .load(sf)
    val q = Blocklist.census(stream, phrases)
      .writeStream.outputMode("complete").format("memory")
      .queryName("blocklist_stream_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT phrase, n_docs_hit, n_docs FROM blocklist_stream_out")
      .collect().map(_.toSeq).toSet
    val batch = Blocklist.census(
      graft.core.Tables.read(spark, sf, "documents"), phrases)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
