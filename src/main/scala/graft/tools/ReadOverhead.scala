package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-measure of per-`Tables.read` driver overhead: how long does the
  * load (file listing + schema inference + plan construction) take, with
  * nothing executed? Informs whether a catalog-level scan-plan memo is
  * worth it for a 326-query bench pass.
  */
object ReadOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.read(spark, dir, "lineitem") // warm codepaths
    for (t <- Seq("lineitem", "orders", "documents", "embeddings")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { graft.core.Tables.read(spark, dir, t); i += 1 }
      val perMs = (System.nanoTime() - t0) / 1e6 / 50
      println(f"$t%-12s load=${perMs}%.1f ms")
    }
    spark.stop()
  }
}
