package graft

import org.apache.spark.sql.SparkSession

/** Demo main: drive the Structured Streaming path end-to-end over a testdata
  * dir (args: [sfDir]) and print the windowed-aggregate row count + sample.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.streaming.Streams.runStreaming(spark, dir, "stream_demo_out")
    q.processAllAvailable()
    q.stop()
    val n = spark.sql("SELECT count(*) FROM stream_demo_out")
      .collect()(0).getLong(0)
    val sample = spark.sql(
      "SELECT * FROM stream_demo_out ORDER BY window_start LIMIT 3")
      .collect().mkString(" | ")
    println(s"STREAM_ROWS=$n SAMPLE=$sample")
    spark.stop()
  }
}
