package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-mode sink layer (reference S5/S6, `etl/core/dim_loader.py:23-30`,
  * `load_311.py:113-126`): skip-if-empty, append disposition. The format
  * string is a real `DataFrameWriter.format` plug point — parquet by
  * default, csv/json/orc for local breadth, and `"graft-warehouse"` for
  * the in-repo LOAD-JOB writer ([[graft.sources.WarehouseSource]]):
  * staged distributed write, atomic manifest-swap commit, BigQuery-style
  * WRITE_APPEND/WRITE_TRUNCATE/WRITE_EMPTY dispositions, blocking
  * driver-side job — the reference's terminal boundary semantics,
  * implementable offline. No call site changes between formats.
  *
  * Scale: append of a partitioned DataFrame is embarrassingly parallel —
  * one file per partition, no shuffle. Callers control layout with
  * `partitionByCols` (e.g. date_key) so downstream scans partition-prune.
  */
object Sink {

  /** Append `df`; returns the number of rows written, observed DURING the
    * write job (`Dataset.observe` piggybacks a CollectMetrics node on the
    * write's own pass) — callers get load observability without re-running
    * the DataFrame's DAG for a count.
    */
  def append(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Long = {
    // skip-if-empty guard (dim_loader.py:26-27) without a full count: limit 1.
    if (df.isEmpty) 0L
    else {
      val obs = org.apache.spark.sql.Observation()
      val observed = df.observe(obs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
      val w = observed.write.mode("append").format(format).options(options)
      (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
        .save(path)
      obs.get("rows").asInstanceOf[Long]
    }
  }

  /** Overwrite `df` at `path`; returns rows written (observed in-flight,
    * as in [[append]]).
    */
  def overwrite(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Long = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val w = observed.write.mode("overwrite").format(format).options(options)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .save(path)
    obs.get("rows").asInstanceOf[Long]
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
      naturalKeys: Seq[String], format: String = "parquet"): Long = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) dim
      else {
        val existing = read(spark, path, format)
          .select(naturalKeys.map(org.apache.spark.sql.functions.col): _*)
        dim.join(existing, naturalKeys, "left_anti")
      }
    append(fresh, path, format = format)
  }
}
