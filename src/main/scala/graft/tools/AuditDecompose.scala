package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of `agg_market_basket`'s byte mass — the
  * round-8 control experiment for the round-7 residual attribution.
  *
  * Round 7 measured the query's shuffle at 13.1 bytes/pair (sf0.1) vs
  * 16.5 (sf1) on EXACTLY 10.0× pair volume and attributed the extra 26%
  * to LZ4 compressing ScaleGen's replica-shifted keys worse. Round 8's
  * equal-key-width control (ScaleGen `dense` mode) DISPROVED that: dense
  * keys measure 17.9 bytes/pair — worse, not better — so the residual is
  * not key entropy. This tool attributes it properly by auditing each
  * constituent exchange in isolation (fresh accumulator per leg, one
  * JVM): the baskets collect_set exchange, the pair-key aggregate, the
  * per-part counts, and the full query for cross-checking.
  *
  * Usage: AuditDecompose [sfDir]
  */
object AuditDecompose {

  private val shuffleWrite = new AtomicLong

  private final class Acc extends SparkListener {
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new Acc)

    def leg(name: String)(body: => Long): Unit = {
      // settle the listener bus, zero the counter, run, drain
      Thread.sleep(1500)
      shuffleWrite.set(0)
      val n = body
      Thread.sleep(1500)
      println(f"""{"leg":"$name","rows":$n,"shuffle_write_mb":${shuffleWrite.get / 1e6}%.3f}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val li = graft.core.Tables.read(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ord"),
        col("l_partkey").cast("long").as("part"))
    def baskets = li.groupBy("ord")
      .agg(sort_array(collect_set(col("part"))).as("parts"))

    leg("baskets_collect_set") { baskets.count() }
    leg("pair_agg") {
      graft.ops.Graph.cappedNeighborPairs(baskets, "parts", 256)
        .select(graft.ops.Graph.packPair(col("s_a"), col("s_b")).as("pp"))
        .groupBy("pp").agg(count(lit(1)).as("n_ab")).count()
    }
    leg("part_counts") {
      baskets.select(explode(col("parts")).as("part"))
        .groupBy("part").agg(count(lit(1)).as("n")).count()
    }
    leg("full_query") {
      graft.SparkEntry.queries("agg_market_basket")(spark, dir).count()
    }
    spark.stop()
  }
}
