package graft.dims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftFunctions, Guards, Normalize}

/** Dimension-loader layer (reference `etl/core/dim_loader.py:8-30` protocol +
  * the six loaders under `etl/dim_loaders/`): each dim is
  * `extract (project+distinct) -> transform (normalize+hash) -> load`.
  *
  * Scale notes: `extract` is a projection + `dropDuplicates` — a hash
  * aggregate with map-side partial combine, the right shape at 100 TB because
  * the distinct runs before any wide stage and dim cardinality is tiny
  * relative to the fact. Transformed dims are broadcast at join time
  * (KeyMapper), never shuffled with the fact.
  */
trait DimLoader {
  /** Natural-key + attribute columns pulled off the raw frame. */
  def naturalCols: Seq[String]
  /** Name of the surrogate hash key column. */
  def keyName: String

  /** P1 + A1: project available columns, dedup (e.g. agency_loader.py:11). */
  def extract(raw: DataFrame): DataFrame =
    Guards.selectAvailable(raw, naturalCols).dropDuplicates()

  /** F1 + F2: normalize strings, stamp surrogate key (agency_loader.py:13-17). */
  def transform(df: DataFrame): DataFrame = {
    val normed = Normalize.normalizeStrings(df, naturalCols)
    normed.withColumn(keyName,
      GraftFunctions.hashKey(naturalCols.filter(normed.columns.contains).map(col)))
  }

  def build(raw: DataFrame): DataFrame = transform(extract(raw))
}

/** Agency-like 2-attribute dim (agency_loader.py) retargeted to testdata:
  * nation name + region name.
  */
object NationDim extends DimLoader {
  val naturalCols = Seq("n_name", "r_name")
  val keyName = "nation_key"
  def fromTables(nation: DataFrame, region: DataFrame): DataFrame =
    build(nation.join(region, nation("n_regionkey") === region("r_regionkey")))
}

/** Complaint-like multi-attribute dim (complaint_loader.py): part brand/type. */
object PartDim extends DimLoader {
  val naturalCols = Seq("p_brand", "p_type")
  val keyName = "part_key"
}

/** Vehicle-like dim (vehicle_loader.py): supplier identity. */
object SupplierDim extends DimLoader {
  val naturalCols = Seq("s_name")
  val keyName = "supplier_key"
}

/** Order-priority dim: status/priority categorical pair. */
object PriorityDim extends DimLoader {
  val naturalCols = Seq("o_orderpriority", "o_orderstatus")
  val keyName = "prio_key"
}

/** Market-segment dim (parking_location-like single-attribute dim). */
object SegmentDim extends DimLoader {
  val naturalCols = Seq("c_mktsegment")
  val keyName = "segment_key"
}

/** G1/G2 row generators (date_loader.py:10-20, time_loader.py:8-21) — pure
  * relational generation via `sequence`+`explode` / `range`; no driver-side
  * loops, so the generated dim parallelizes like any other table.
  */
object Generators {

  /** G1: one row per day over [start, end] inclusive (both pandas
    * `date_range` and Spark `sequence` are end-inclusive — pinned in
    * GeneratorsSpec).
    */
  def dateDim(spark: SparkSession, start: String, end: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(
      s"SELECT explode(sequence(DATE'$start', DATE'$end', interval 1 day)) AS d")
      .select(
        date_format(col("d"), "yyyyMMdd").cast("long").as("date_key"),
        date_format(col("d"), "yyyy-MM-dd").as("full_date"),
        dayofmonth(col("d")).cast("long").as("day"),
        month(col("d")).cast("long").as("month"),
        year(col("d")).cast("long").as("year"),
        date_format(col("d"), "EEEE").as("weekday"))
  }

  /** G2: one row per minute of day, 1440 rows (time_loader.py:14). */
  def timeDim(spark: SparkSession): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    spark.range(0, 1440).select(
      (floor(col("id") / 60) * 10000 + (col("id") % 60) * 100).cast("long")
        .as("time_key"),
      floor(col("id") / 60).cast("long").as("hour"),
      (col("id") % 60).cast("long").as("minute"))
  }
}
