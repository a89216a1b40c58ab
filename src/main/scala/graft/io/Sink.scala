package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-mode sink layer (reference S5/S6, `etl/core/dim_loader.py:23-30`,
  * `load_311.py:113-126`): skip-if-empty, append disposition. The format
  * string is a real `DataFrameWriter.format` plug point — parquet by
  * default, csv/json for local breadth, and a warehouse connector name
  * (the reference loads to BigQuery via a pandas-gbq call; here any DSv2
  * writer on the classpath slots in) without touching call sites.
  *
  * Scale: append of a partitioned DataFrame is embarrassingly parallel —
  * one file per partition, no shuffle. Callers control layout with
  * `partitionByCols` (e.g. date_key) so downstream scans partition-prune.
  */
object Sink {

  def append(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    // skip-if-empty guard (dim_loader.py:26-27) without a full count: limit 1.
    if (!df.isEmpty) {
      val w = df.write.mode("append").format(format).options(options)
      (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
        .save(path)
    }
  }

  def overwrite(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode("overwrite").format(format).options(options)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** Idempotent dim append — the documented fix for the reference's
    * append-duplication quirk (SURVEY §2.8/§7.4.6: per-slice dedup + append
    * means dims accumulate duplicate natural keys across runs). Anti-joins
    * the incoming dim against the already-written natural keys and appends
    * only genuinely new rows. At scale this is the file-format analog of a
    * MERGE: one broadcast-able anti-join per slice against a small dim.
    */
  def upsertDim(spark: SparkSession, dim: DataFrame, path: String,
      naturalKeys: Seq[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) dim
      else {
        val existing = read(spark, path)
          .select(naturalKeys.map(org.apache.spark.sql.functions.col): _*)
        dim.join(existing, naturalKeys, "left_anti")
      }
    append(fresh, path)
  }
}
