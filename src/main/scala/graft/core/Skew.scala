package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
    * The salt must vary WITHIN a hot key, so it is derived from a row
    * fingerprint, not the join key alone — a salt that is a function of
    * the key would send every row of the hot key to the same (key, salt)
    * partition and mitigate nothing. The fingerprint hashes the key plus
    * a bounded subset of the row's HASHABLE columns (`hash()` raises an
    * analysis error on MapType, including maps nested in structs/arrays,
    * and hashing every column of a wide row costs ∝ width): up to
    * [[SaltFingerprintCols]] non-key columns, taken in schema order so
    * the salt is stable across runs. Identical fingerprint rows still
    * co-locate, which is harmless: skew in practice comes from many
    * distinct rows sharing a key. SkewSpec asserts the resulting
    * (key, salt) bucket bound on a deliberately hot-keyed frame.
    */
  val SaltFingerprintCols = 8

  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val fingerprint = col(key) +: large.schema.fields
      .filter(f => f.name != key && hashable(f.dataType))
      .take(SaltFingerprintCols)
      .map(f => col(f.name)).toSeq
    val salted = large.withColumn("__salt",
      pmod(hash(fingerprint: _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
