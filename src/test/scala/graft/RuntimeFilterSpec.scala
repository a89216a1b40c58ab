package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection: when a selective dimension filter sits
  * on one side of a shuffle join, Spark can build a bloom filter from the
  * filtered side and push it into the fact scan — a semi-join reduction
  * that prunes shuffle input at 100 TB. The thresholds default to
  * cluster-scale sizes (10 GB application side), so the spec lowers them
  * to prove the mechanism on local data; results must be identical with
  * the filter on and off.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val keys = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.autoBroadcastJoinThreshold")

  private def withConf[A](kv: Map[String, String])(body: => A): A = {
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter is injected into the probe side and preserves results") {
    def shape() = {
      val o = graft.core.Tables.read(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.core.Tables.read(spark, sf, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }
    val baseline = shape().collect().map(_.toSeq).toSet

    withConf(Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local parquet is KBs; drop the cluster-scale gates to 0
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val df = shape()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no bloom runtime filter in plan:\n$plan")
      assert(df.collect().map(_.toSeq).toSet === baseline)
    }
  }
}
