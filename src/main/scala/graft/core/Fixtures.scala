package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, count, hash, lit, sum}

/** Shared content-fingerprint for /tmp fixture cache keys: row count plus
  * an order-independent hash-sum over the persisted columns (the
  * GraphFixtures discipline — a regenerated corpus with different values
  * must miss the fixture).
  *
  * Memoized per (session, input plan, column set): the fingerprint is an
  * aggregate ACTION, and before this memo every fixture-backed query
  * re-ran it on every bench pass (~0.1-0.3 s of driver+job time each)
  * against inputs that are immutable for the life of a session. The memo
  * key includes the analyzed plan's semanticHash, so two fingerprints
  * over different frames (or different filters of the same table) can
  * never share an entry.
  */
object Fixtures {

  /** Memoized resolved parquet scan of an immutable fixture path (most
    * carry a content fingerprint in the path; the rest are create-once
    * within a session). Re-resolving pays a listing + schema-inference
    * pass per call (~70-100 ms measured); the memo reuses the lazy plan —
    * data is still read from the files on every action. NOT for paths a
    * query can rewrite mid-session (warehouse generations go through
    * WarehouseMeta's validated manifest cache instead).
    */
  def scan(s: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    SessionMemo(s, s"scan_$path")(s.read.parquet(path))

  def contentFp(df: DataFrame, cols: Column*): String = {
    val key = s"fp_${df.queryExecution.analyzed.semanticHash()}_" +
      cols.mkString("|").hashCode
    SessionMemo(df.sparkSession, key) {
      val r = df.agg(count(lit(1)), sum(hash(cols: _*))).head()
      s"${r.getLong(0)}_${java.lang.Long.toHexString(r.getLong(1))}"
    }
  }
}
