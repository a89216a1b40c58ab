package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Catalog, Tables}

/** Stream-stream joins (Structured Streaming's stateful two-input
  * operator). The batch twin ([[clickPurchaseBatch]]) is the semantics
  * oracle: an AvailableNow pass over the same files must emit exactly the
  * batch join's rows.
  */
object StreamJoins {

  private def side(raw: DataFrame, tpe: String, a: String): DataFrame =
    raw.filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${a}_user"), col("ts").as(s"${a}_ts"),
        col("event_id").as(s"${a}_id"))
      // Watermark bounds the join state: with the time-range predicate
      // below, Spark evicts a click once the purchase-side watermark
      // passes click_ts + 10 min — state is O(events in the window),
      // never the whole stream.
      .withWatermark(s"${a}_ts", "20 minutes")

  private def joined(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.join(purchases,
      expr("""c_user = p_user AND
             |p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes""".stripMargin))
      .select(col("c_user").as("user_id"), col("c_id"), col("p_id"))

  /** Purchases within 10 minutes after a click by the same user, streaming.
    * Both inputs derive from one file source; Spark plans two stateful
    * scan legs with independent watermarks.
    */
  def clickPurchaseStreaming(spark: SparkSession, dir: String, glob: String,
      queryName: String): StreamingQuery = {
    graft.core.GraftFunctions.ensureRegistered(spark)
    val rawSchema = spark.read.parquet(Tables.path(dir, "events")).schema
    val raw = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", glob)
      .format("parquet")
      .load(dir)
      .transform(Catalog.rebuildTs(_, "ts"))
    joined(side(raw, "click", "c"), side(raw, "purchase", "p"))
      .writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
  }

  /** The batch twin over the same table — same predicate, no state. */
  def clickPurchaseBatch(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.read(spark, dir, "events")
    joined(side(raw, "click", "c"), side(raw, "purchase", "p"))
  }
}
