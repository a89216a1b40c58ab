package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection main: `runMain graft.ExplainRunner <query> [sfDir]`
  * prints the formatted physical plan and wall time for one declared query —
  * the per-operator feedback loop for shuffle/pushdown/codegen auditing.
  */
object ExplainRunner {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("agg_star_rollup")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, dir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(s"RUN$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
