package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftFunctions

/** Deterministic sampling for training-data pipelines. Everything here is
  * a pure per-row filter/projection on a salted content hash — no shuffle,
  * no RNG state, and the SAME rows are selected on every run, every engine,
  * and every cluster size (unlike `df.sample`, whose output depends on
  * partitioning). That reproducibility is the property curation pipelines
  * actually need: a re-run of a 100 TB job must produce the identical
  * train set.
  */
object Sampling {

  /** Uniform bucket in [0, 10000) from the salted 63-bit hash of `id` —
    * the sampling/splitting primitive (basis-point granularity).
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(GraftFunctions.hash64(
      concat_ws("|", lit(salt), id.cast("string"))), lit(10000L))

  /** Stratified sample: per-stratum keep-rates (basis points of 10000),
    * e.g. keep 50% of "en" docs but 100% of low-resource languages —
    * the standard rebalancing step before training-mix assembly.
    */
  def stratified(df: DataFrame, strataCol: String, id: Column,
      rates: Map[String, Int], defaultRate: Int,
      salt: String = "strat"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(id, salt) < rate)
  }

  /** Deterministic train/val/test split by hash range:
    * [0, train) / [train, train+val) / rest, in basis points.
    * A document's split NEVER changes as the corpus grows — the property
    * that keeps eval sets uncontaminated across dataset versions.
    */
  def split(df: DataFrame, id: Column, trainBp: Int, valBp: Int,
      salt: String = "split"): DataFrame = {
    val b = hashBucket(id, salt)
    df.withColumn("split",
      when(b < trainBp, "train")
        .when(b < trainBp + valBp, "val")
        .otherwise("test"))
  }
}
