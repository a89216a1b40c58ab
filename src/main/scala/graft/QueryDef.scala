package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator demo: Spark implementation + optional DuckDB oracle
  * (driver contract, `Verify.scala`). Oracle-less entries get the driver's
  * weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Shared SQL fragments so the DuckDB oracle mirrors the Scala engine
    * term-for-term.
    */
  object Sql {
    /** F1 normalize: null→'', cast, trim, lower (utils.py:10-16). */
    def norm(col: String): String =
      s"lower(trim(coalesce(CAST($col AS VARCHAR), '')))"

    /** Big-endian 64-bit halves of the MD5 digest. DuckDB's
      * `md5_number_upper/lower` read the digest little-endian, so we go
      * through the hex string instead: first/last 16 hex chars cast via a
      * 0x-literal — bit-identical to HashKeyOps' big-endian byte fold.
      */
    private def md5Hi(expr: String): String =
      s"CAST('0x' || substr(md5($expr), 1, 16) AS UBIGINT)"
    private def md5Lo(expr: String): String =
      s"CAST('0x' || substr(md5($expr), 17, 16) AS UBIGINT)"

    /** F2 surrogate hash: 128-bit MD5 of the string, mod 1e9 — folded through
      * the two 64-bit halves: ((hi%m)*(2^64%m) + lo%m) % m, m=1e9,
      * 2^64%m=709551616 (SURVEY §7.4).
      */
    def hashKey(expr: String): String =
      s"CAST(((${md5Hi(expr)} % 1000000000) * 709551616 + " +
        s"(${md5Lo(expr)} % 1000000000)) % 1000000000 AS BIGINT)"

    /** 63-bit stable hash = upper MD5 half >> 1 (graft.core.HashKeyOps.md5Hi64). */
    def hash64(expr: String): String =
      s"CAST(${md5Hi(expr)} // 2 AS BIGINT)"

    /** Pipe-join of pre-normalized columns (utils.py:5-8 key construction). */
    def pipeKey(cols: Seq[String]): String =
      cols.map(norm).mkString(" || '|' || ")
  }
}
