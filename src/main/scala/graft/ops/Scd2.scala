package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: apply a batch of changed rows to a
  * versioned dimension — close the superseded versions (set `valid_to`),
  * insert the new versions as current. The versioned-dim counterpart of
  * the hard upsert in [[Merge.upsert]] (reference dim loads replace rows;
  * SCD2 is what a warehouse that must keep history does instead).
  *
  * One left-semi-ish join per side, all on the natural key: closed = dim
  * ∩ changes (marked), untouched = dim ∖ changes, new = changes. No full
  * rewrite of unaffected partitions beyond the key shuffle; at warehouse
  * scale the changes side is small → broadcast.
  */
object Scd2 {

  /** `dim` must carry (`keyCol`, payload..., `valid_from`, `valid_to`,
    * `is_current`); `changes` carries (`keyCol`, payload...). Every change
    * row becomes the new current version effective `effectiveDate`
    * (yyyy-MM-dd string).
    */
  def apply(dim: DataFrame, changes: DataFrame, keyCol: String,
      effectiveDate: String): DataFrame = {
    val keys = changes.select(col(keyCol)).distinct()
      .withColumn("_hit", lit(1))
    // one broadcast join marks affected rows; both legs filter from it
    val marked = dim.join(broadcast(keys), Seq(keyCol), "left")
    val superseded = col("_hit").isNotNull && col("is_current")
    val closed = marked.filter(superseded)
      .withColumn("valid_to", lit(effectiveDate))
      .withColumn("is_current", lit(false))
      .drop("_hit")
    val untouched = marked.filter(!superseded).drop("_hit")
    val fresh = changes
      .withColumn("valid_from", lit(effectiveDate))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
    untouched.unionByName(closed).unionByName(fresh)
  }
}
