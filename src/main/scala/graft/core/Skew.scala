package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join. When one join key carries a
  * disproportionate share of the big side (the 100 TB killer: one hot key
  * lands on one reducer), split the hot key's rows across `salts` buckets
  * and replicate the small side once per bucket — the shuffle key becomes
  * (key, salt), bounding any single task at ~1/salts of the hot key.
  *
  * AQE's skew-join handles the sort-merge case adaptively; explicit salting
  * is the deterministic fallback for aggregations-after-join and for engines
  * where the small side can't be broadcast.
  */
object Skew {

  /** Inner equi-join of `large` and `small` on `key`, salted `salts` ways.
    * Result is row-identical to `large.join(small, key)` (asserted in
    * SkewSpec and the join_salted oracle).
    *
    * The salt must vary WITHIN a hot key, so it is derived from the hash of
    * the entire large-side row — a salt that is a function of the join key
    * alone would send every row of the hot key to the same (key, salt)
    * partition and mitigate nothing. Identical duplicate rows still
    * co-locate (their full-row hashes collide), which is harmless: skew in
    * practice comes from many distinct rows sharing a key. SkewSpec asserts
    * the resulting (key, salt) bucket bound on a deliberately hot-keyed
    * frame.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
