package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism repair for compute-heavy paths over small scans —
  * the optimization guide's "input skew: one huge unsplittable file …
  * repartition immediately after the read" remedy (§2.5), gated so it is
  * a NO-OP at scale.
  *
  * A single small parquet file arrives as ONE scan partition (splits are
  * sized by `spark.sql.files.maxPartitionBytes`, and one row group cannot
  * split further), so every downstream narrow transformation — explode,
  * tokenize, decimal arithmetic — runs on one core no matter how many the
  * session has. Measured at sf0.1/local[32]: the PCA Gram build spent
  * ~9 s of task time on ≤2 of 32 cores.
  *
  * The gate reads the ACTUAL scan partition count off the physical plan
  * (no job runs) and repartitions only when the input is narrower than
  * half the session's cores; a 100 TB scan already arrives thousands of
  * partitions wide, so production plans keep their shape and pay no extra
  * exchange. The partition count is `spark.sql.shuffle.partitions`
  * (pinned explicitly — an un-numbered repartition is AQE-coalescible,
  * which would undo the spread on the very inputs that need it).
  */
object Parallelism {

  /** `df` hash-repartitioned on `key` iff its current plan parallelism is
    * below half the session's default parallelism; identity otherwise.
    */
  def spread(df: DataFrame, key: Column): DataFrame =
    spread(df, key, df.sparkSession.sessionState.conf.numShufflePartitions)

  /** As [[spread]] with an explicit width — for paths whose downstream
    * stages inherit the checkpointed partitioning and pay a fixed
    * per-task cost per consumer stage, a moderate width (e.g. a quarter
    * of the shuffle width) can beat the full one: the heavy map-side
    * work still parallelizes while the many cheap downstream stages
    * schedule 4× fewer tasks. Measured per call site.
    */
  def spread(df: DataFrame, key: Column, parts: Int): DataFrame = {
    val sess = df.sparkSession
    val cores = sess.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, cores / 2))
      df.repartition(math.max(2, parts), key)
    else df
  }
}
