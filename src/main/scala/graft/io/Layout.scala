package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: Z-order (Morton) clustering for multi-column
  * data skipping.
  *
  * A parquet scan prunes files/row-groups whose min/max statistics exclude
  * the predicate. A linear sort on column X gives perfect X-pruning but
  * leaves every other column's ranges full-width in every file. Interleaving
  * the bits of two (bounded) key columns and range-partitioning + sorting by
  * that Morton key keeps BOTH columns locally clustered, so min/max stats
  * narrow on either predicate — the layout primitive behind multi-dimension
  * skipping in modern lakehouse writers.
  *
  * Scale: `repartitionByRange(zkey)` is one range-shuffle of the data being
  * written (sampled bounds, balanced output files) and
  * `sortWithinPartitions` is a per-partition sort — no global sort, no
  * driver materialization. At 100 TB this is the same one-shuffle cost as
  * any clustered write.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative columns:
    * x occupies even bit positions, y odd. Pure shift/or fold — codegen'd,
    * no UDF. Callers bound the inputs first (e.g. `pmod(col, 1 << bits)`).
    */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce[Column](_ bitwiseOR _)

  /** Write `df` parquet at `path`, z-ordered on the low `bits` bits of the
    * two dimension columns, into `numFiles` range partitions of the Morton
    * key. The helper key never lands in the output schema.
    */
  def writeZOrdered(df: DataFrame, dimX: String, dimY: String, path: String,
      bits: Int = 10, numFiles: Int = 16): Unit = {
    val bound = lit(1L << bits)
    val zkey = mortonInterleave(pmod(col(dimX), bound), pmod(col(dimY), bound),
      bits)
    df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] with both dimensions first min/max-scaled to the
    * full `bits`-wide integer range. Raw interleaving lets the wider
    * dimension's high bits dominate the Morton key (a 12-bit day domain
    * against an 8-bit key domain degenerates to a day sort); scaling
    * balances the interleave so BOTH columns cluster. The transform is
    * monotone per dimension, so file-level min/max stats on the ORIGINAL
    * columns still narrow — pruning needs no knowledge of the key. One
    * extra metadata-sized agg (4 values) per write.
    */
  def writeZOrderedScaled(df: DataFrame, dimX: String, dimY: String,
      path: String, bits: Int = 10, numFiles: Int = 16): Unit = {
    val b = df.agg(
      min(col(dimX).cast("long")), max(col(dimX).cast("long")),
      min(col(dimY).cast("long")), max(col(dimY).cast("long"))).first()
    val top = (1L << bits) - 1
    // Scale in DECIMAL(38,0) with integral `div`: an int64 (x-lo)*top
    // multiply silently wraps once the domain width passes ~9e15, and
    // float `/` loses exactness past 2^53 — either way the clustering
    // degenerates with no error (the key is layout-only, so data stays
    // safe but skipping quietly stops working). Decimal keeps the
    // product exact for the full long domain; `div` floors back to
    // BIGINT in [0, top].
    def scaled(c: String, lo: Long, hi: Long): Column =
      expr(s"""(CAST(CAST($c AS BIGINT) AS DECIMAL(38,0)) - $lo) * $top
              | div ${math.max(hi - lo, 1L)}""".stripMargin)
    val zkey = mortonInterleave(
      scaled(dimX, b.getLong(0), b.getLong(1)),
      scaled(dimY, b.getLong(2), b.getLong(3)), bits)
    df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` parquet linearly sorted on one column (the single-dimension
    * baseline layout), same file count.
    */
  def writeLinearSorted(df: DataFrame, dim: String, path: String,
      numFiles: Int = 16): Unit =
    df.repartitionByRange(numFiles, col(dim))
      .sortWithinPartitions(dim)
      .write.mode("overwrite").parquet(path)

  /** File-level (min, max) ranges of `dim` for the parquet files at `path` —
    * the same statistics a scan consults for skipping, computed
    * distributedly via `input_file_name`.
    */
  def fileRanges(spark: org.apache.spark.sql.SparkSession, path: String,
      dim: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))

  /** How many files of `path` a point predicate `dim = v` could touch,
    * judged by file-level min/max — the count a stats-pruned scan reads.
    */
  def filesCovering(spark: org.apache.spark.sql.SparkSession, path: String,
      dim: String, v: Long): Long =
    fileRanges(spark, path, dim)
      .filter(col("lo") <= v && col("hi") >= v).count()
}
