package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Byte-level audit for the PLANS.md scaling story: runs named queries and
  * reports, per query, the bytes that actually MOVED — input read from
  * parquet, shuffle write, shuffle read — plus wall time. Time exponents
  * can hide a shuffle that grows superlinearly behind a floor-bound total;
  * byte counts can't. Run at two SFs and compare: a query whose plan-shape
  * claim is "shuffle ∝ keys, not rows" must show shuffle bytes growing
  * slower than input bytes.
  *
  * Usage: ShuffleAudit <q1,q2,...|all> [sfDir] — prints one JSON line per
  * query: {"query":..,"sec":..,"input_mb":..,"shuffle_write_mb":..,
  * "shuffle_read_mb":..}. Stage metrics are collected by a listener on
  * stage completion; a short post-query drain covers the listener bus's
  * asynchrony (audit tool, not a gate — ±one late stage would show as an
  * off-by-small artifact, and the drain makes that unobserved in
  * practice).
  */
object ShuffleAudit {

  private val inputBytes = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val shuffleRead = new AtomicLong

  private final class Acc extends SparkListener {
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("all")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new Acc)

    val queries =
      if (names == "all") graft.SparkEntry.queries
      else {
        val want = names.split(",").map(_.trim).filter(_.nonEmpty)
        want.map(n => n -> graft.SparkEntry.queries(n)).toMap
      }

    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).count() // warmup: codegen + footer caches
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // drain listener events from the warmup
      inputBytes.set(0); shuffleWrite.set(0); shuffleRead.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain this query's stage-completed events
      def mb(x: Long): Double = math.round(x / 1048.576) / 1000.0
      println(f"""{"query":"$name","sec":$sec%.3f,"input_mb":${mb(inputBytes.get)},"shuffle_write_mb":${mb(shuffleWrite.get)},"shuffle_read_mb":${mb(shuffleRead.get)}}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
