package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle a fact by its join key ONCE at write
  * time so every subsequent equi-join/aggregation on that key runs with no
  * Exchange — the canonical 100 TB co-location strategy for repeatedly
  * joined tables (verified shuffle-free in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
