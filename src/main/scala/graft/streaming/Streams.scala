package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Tables

/** Streaming layer. The reference has no streaming engine but its operating
  * model is incremental micro-batch (SURVEY §2.8): daily slices, append
  * sinks. Structured Streaming expresses that directly: the same transform
  * runs in batch (oracle-checked) and as a stream over the same files.
  */
object Streams {

  /** Tumbling 5-minute window aggregate per event type — the canonical
    * watermarked streaming aggregation, written as a plain DataFrame
    * transform so batch and streaming share one definition. Sums go
    * through DECIMAL for order-independent results.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch face of the streaming aggregate (declared as a query). */
  def windowedAggBatch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.read(spark, dir, "events"))
      .orderBy("window_start", "event_type")

  /** Sessionization, batch form (gaps-and-islands): a new session starts
    * after a quiet gap > `gapMinutes`. Classic curation/analytics shape;
    * all arithmetic in epoch-microsecond integers so the DuckDB oracle is
    * bit-exact.
    */
  def sessionizeBatch(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val events = Tables.read(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum("new_sess")
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx").cast("long").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Stateful streaming aggregation (`mapGroupsWithState`): a per-user
    * running event count maintained in GroupState across micro-batches —
    * the custom-state face of the streaming layer (used by StreamingSpec).
    */
  def runningCountsStreaming(spark: SparkSession, dir: String,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    graft.core.GraftFunctions.ensureRegistered(spark)
    val rawSchema = spark.read.parquet(Tables.path(dir, "events")).schema
    val events = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .format("parquet")
      .load(dir)
      .select(col("user_id").as[Long], col("event_id").as[Long])
      .as[(Long, Long)]
    val counted = events.groupByKey(_._1).mapGroupsWithState(
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
      (user: Long, rows: Iterator[(Long, Long)],
          state: org.apache.spark.sql.streaming.GroupState[Long]) =>
        val total = state.getOption.getOrElse(0L) + rows.size
        state.update(total)
        (user, total)
    }.toDF("user_id", "n_events")
    counted.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** S7's streaming analog: the incremental append pipeline as
    * `foreachBatch` — every micro-batch is one reference "slice", cleaned
    * (date/time keys derived) and appended to the sink, exactly the
    * daily-slice + append model of `load_history.py` but driven by the
    * stream engine's offset tracking instead of a subprocess loop.
    */
  def incrementalAppend(spark: SparkSession, dir: String,
      outPath: String): StreamingQuery = {
    graft.core.GraftFunctions.ensureRegistered(spark)
    val rawSchema = spark.read.parquet(Tables.path(dir, "events")).schema
    val events = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .format("parquet")
      .load(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cleaned = batch
          .withColumn("date_key", graft.core.TimeParse.dateKey(col("ts")))
          .withColumn("time_key", graft.core.TimeParse.timeKey(col("ts")))
        graft.io.Sink.append(cleaned, outPath): Unit
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .start()
  }

  /** True streaming run over the same parquet: file source -> watermark ->
    * windowed agg -> memory sink, driven synchronously (used by
    * StreamingSpec; the reference's daily-batch loop is the degenerate
    * trigger-once case).
    */
  def runStreaming(spark: SparkSession, dir: String,
      queryName: String): StreamingQuery = {
    graft.core.GraftFunctions.ensureRegistered(spark)
    // schema of the raw file (ts arrives as nanos-long under
    // nanosAsLong; rebuilt below exactly like Tables.read does for batch)
    val rawSchema = spark.read.parquet(Tables.path(dir, "events")).schema
    // file stream sources require a directory: point at the sf dir and
    // glob-filter to the events table only
    val events = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .format("parquet")
      .load(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    windowedAgg(events.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
