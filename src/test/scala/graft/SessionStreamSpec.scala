package graft

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming sessionization parity: events flow through a temp directory in
  * waves; a far-future sentinel wave closes every open session, after which
  * the streamed output must equal the batch transform over the original
  * events. Sentinel sessions stay open (or beyond the comparison horizon)
  * and are excluded by construction.
  */
class SessionStreamSpec extends SparkSpec {

  private def fs = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  /** Fresh stream dir seeded with the raw events file as wave 1. */
  private def setupDir(name: String): String = {
    val out = s"/tmp/graft_sessstream_$name"
    fs.delete(new Path(out), true)
    fs.mkdirs(new Path(out))
    FileUtil.copy(fs, new Path(graft.core.Tables.path(sf, "events")),
      fs, new Path(s"$out/events.parquet"), false, true,
      spark.sparkContext.hadoopConfiguration)
    out
  }

  /** One sentinel event per user at globalMax + `hoursAhead`, dropped into
    * the stream dir as a new wave (part files renamed in so the file
    * source's next listing picks them up atomically).
    */
  private def writeSentinels(dir: String, hoursAhead: Int,
      wave: String): Unit = {
    val raw = spark.read.parquet(graft.core.Tables.path(sf, "events"))
    // ts physical type varies by testdata generation (nanos long vs µs
    // timestamp) — shift in the file's own domain so the wave's schema
    // matches wave 1 (the raw file copy)
    val gmax = raw.agg(max("ts").as("gmax"))
    val shifted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("gmax") + lit(hoursAhead * 3600L * 1000000000L)
      case _ => col("gmax") + expr(s"INTERVAL $hoursAhead HOURS")
    }
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val sentinels = raw
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .crossJoin(broadcast(gmax))
      .withColumn("ts", shifted).drop("gmax")
      .withColumn("event_id", col("event_id") + 1000000000L)
    val tmp = s"$dir-tmp-$wave"
    fs.delete(new Path(tmp), true)
    sentinels.write.parquet(tmp)
    fs.listStatus(new Path(tmp)).filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        fs.rename(f.getPath, new Path(s"$dir/$wave-$i.parquet"))
      }
    fs.delete(new Path(tmp), true)
  }

  test("flatMapGroupsWithState emits exactly the batch sessions once a later wave closes them") {
    val dir = setupDir("fmg")
    val q = Streams.sessionizeClosedStreaming(spark, dir, "*.parquet", "sess_fmg_out")
    try {
      q.processAllAvailable()
      writeSentinels(dir, 2, "wave2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      """SELECT user_id, session_idx, n_events, session_start, total_value
        |FROM sess_fmg_out""".stripMargin)
      .collect().map(_.toSeq).toSet
    val batch = Streams.sessionizeBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // sentinel sessions never close, so the streamed set IS the batch set
    assert(streamed === batch)
  }

  test("session_window streaming emits the batch sessions after the watermark passes") {
    val dir = setupDir("sw")
    // global max event second, generic over the ts physical type
    val raw = graft.core.Tables.read(spark, sf, "events")
    val globalMaxUs = raw.agg(max(unix_micros(col("ts"))))
      .collect().head.getLong(0)
    val horizon = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(globalMaxUs, 1000000L)))
    val q = Streams.sessionWindowStreaming(spark, dir, "*.parquet", "sess_sw_out")
    try {
      q.processAllAvailable()
      // wave 2 pushes the watermark past every original session's end;
      // wave 3's data batch then applies that watermark and emits them
      writeSentinels(dir, 2, "wave2")
      q.processAllAvailable()
      writeSentinels(dir, 4, "wave3")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
      s"""SELECT user_id, session_start, session_end, n_events, total_value
         |FROM sess_sw_out WHERE session_start <= '$horizon'""".stripMargin)
      .collect().map(_.toSeq).toSet
    val batch = Streams.sessionWindowBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}

/** Batch ≡ stream for the peak-concurrency sweep line: the streaming face
  * emits one (Σd, max-prefix, count) monoid row per hour bucket as the
  * watermark closes it; Sweep.finalizeConcurrency over those rows must
  * equal the batch Sweep.hourlyConcurrency over the same events.
  */
class ConcStreamSpec extends SparkSpec {

  private def fs = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  test("streamed sweep monoids assemble to the batch hourly peaks") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val dir = "/tmp/graft_concstream"
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    FileUtil.copy(fs, new Path(graft.core.Tables.path(sf, "events")),
      fs, new Path(s"$dir/events.parquet"), false, true,
      spark.sparkContext.hadoopConfiguration)

    // sentinel wave: every event shifted far forward, in the file's own
    // ts domain (nanos long vs µs timestamp varies by generation) — the
    // watermark must pass every real bucket's end so its timeout fires
    def writeWave(hoursAhead: Int, wave: String): Unit = {
      val raw = spark.read.parquet(graft.core.Tables.path(sf, "events"))
        .limit(10)
      val shifted = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + lit(hoursAhead * 3600L * 1000000000L)
        case _ => col("ts") + expr(s"INTERVAL $hoursAhead HOURS")
      }
      val sentinels = raw.withColumn("ts", shifted)
        .withColumn("event_id", col("event_id") + 2000000000L)
      val tmp = s"$dir-tmp-$wave"
      fs.delete(new Path(tmp), true)
      sentinels.write.parquet(tmp)
      fs.listStatus(new Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          fs.rename(f.getPath, new Path(s"$dir/$wave-$i.parquet"))
        }
      fs.delete(new Path(tmp), true)
    }

    val q = Streams.concurrencyStreaming(spark, dir, "*.parquet", "conc_out")
    try {
      q.processAllAvailable()
      writeWave(1000, "wave2")
      q.processAllAvailable()
      writeWave(2000, "wave3") // the data batch that applies wave2's watermark
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.ops.Sweep.hourlyConcurrency(
      graft.core.Tables.read(spark, sf, "events"))
    val maxRealBucket = graft.core.Tables.read(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0) /
      graft.ops.Sweep.HourUs + 1
    val streamedMonoids = spark.table("conc_out")
      .filter(col("bucket") <= maxRealBucket)
    val assembled = graft.ops.Sweep.finalizeConcurrency(streamedMonoids)
      .collect().map(_.toSeq).toSeq
    val expected = batch.collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty)
    assert(assembled === expected)
  }
}
