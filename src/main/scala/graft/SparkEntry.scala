package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.ReferenceQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query is one operator demo from SURVEY §2 (reference
  * surface) or the training-data-pipeline extensions (§7.6), each paired with
  * a DuckDB oracle in [[oracleSql]] unless truly non-SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    ReferenceQueries.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.ExtraQueries.all ++ graft.queries.AnalyticsQueries.all ++
      graft.queries.TemporalQueries.all ++ graft.queries.TpchQueries.all ++
      graft.queries.FunctionQueries.all ++ graft.queries.CurationQueries.all ++
      graft.queries.ProfilingQueries.all ++ graft.queries.GraphQueries.all ++
      graft.queries.BehaviorQueries.all ++ graft.queries.MlQueries.all ++
      graft.queries.StatQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full star build — clean fact, three broadcast dim stampings,
    * date-key derivation (reference main.py:101-146 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.facts.Star.buildFact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
