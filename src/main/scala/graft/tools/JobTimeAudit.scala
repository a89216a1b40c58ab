package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Wall-time decomposition for one declared query: how many Spark jobs it
  * runs, how much wall time the jobs cover vs the gaps between them
  * (driver-side planning / scheduling / collect), and per-stage task-time
  * vs wall-time so scheduling overhead is attributable (guide §1: decide
  * whether time goes to compute, shuffle, or the scheduler before touching
  * anything).
  *
  * Usage: JobTimeAudit <query> [sfDir] — runs the query 3× after one
  * warmup, prints per-run: jobs, stages, tasks, sum of task time, job wall
  * coverage, gap time.
  */
object JobTimeAudit {

  private final class Acc extends SparkListener {
    val jobs = mutable.ArrayBuffer.empty[(Long, Long)] // (start, end) ms
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var shuffleWriteB = 0L
    private val jobStart = mutable.Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobStart(j.jobId) = j.time }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(j.jobId).foreach(s => jobs += ((s, j.time)))
    }
    val stageRows = mutable.ArrayBuffer.empty[String]
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        tasks += s.stageInfo.numTasks
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          val wall = (for {
            c <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
          } yield c - b).getOrElse(-1L)
          stageRows += f"    stage=${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%4d wall=${wall / 1000.0}%7.3f taskTime=${m.executorRunTime / 1000.0}%8.3f shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2f shufR=${m.shuffleReadMetrics.remoteBytesRead / 1e6 + m.shuffleReadMetrics.localBytesRead / 1e6}%8.2f ${s.stageInfo.name.take(60)}"
        }
      }
    def reset(): Unit = synchronized {
      jobs.clear(); stages = 0; tasks = 0; taskTimeMs = 0
      shuffleWriteB = 0; jobStart.clear(); stageRows.clear()
    }
    /** Wall-clock covered by ≥1 running job (union of intervals). */
    def jobCoverMs: Long = synchronized {
      val sorted = jobs.sortBy(_._1)
      var cover = 0L; var curS = -1L; var curE = -1L
      sorted.foreach { case (s, e) =>
        if (s > curE) { if (curE > curS) cover += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE > curS) cover += curE - curS
      cover
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("tpch_q1")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val fn = graft.SparkEntry.queries(name)

    fn(spark, dir).count() // warmup
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    (1 to 3).foreach { i =>
      Thread.sleep(800) // drain listener bus
      acc.reset()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(800)
      val cover = acc.jobCoverMs
      println(f"RUN$i rows=$n wall=${wallMs / 1000}%.3f jobs=${acc.jobs.size} " +
        f"stages=${acc.stages} tasks=${acc.tasks} " +
        f"taskTime=${acc.taskTimeMs / 1000.0}%.3f " +
        f"jobCover=${cover / 1000.0}%.3f gaps=${(wallMs - cover) / 1000}%.3f " +
        f"shufMB=${acc.shuffleWriteB / 1e6}%.3f")
      if (i == 3 && sys.env.contains("JTA_STAGES"))
        acc.stageRows.foreach(println)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
