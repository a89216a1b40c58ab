package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 surrogate-key assignment — the reference's only join
  * (`etl/core/key_mapper.py:5-49`): left hash equi-join of fact onto dim over
  * a pipe-joined composite natural key, stamping the dim's hash key column
  * onto the fact and dropping the natural-key columns.
  *
  * Scale design: the dim side is always a deduped slice (small), so we
  * `broadcast()` it explicitly — at 100 TB the fact side never shuffles for
  * these stampings; each is a map-side broadcast-hash-join.
  */
object KeyMapper {

  /** Stamp `keyName` onto `fact` by joining `dim` on `naturalKeys`.
    *
    * Inputs are expected pre-normalized (null→"", trim, lower — reference
    * normalizes before calling `assign_keys`, `main.py:84-92`), so the
    * pipe-joined key is null-free and null natural keys compare equal via "".
    * If the fact is missing any natural-key column, the key is stamped null
    * and nothing is dropped beyond present key columns (P4 guard,
    * key_mapper.py:11-19).
    */
  def assignKeys(
      fact: DataFrame,
      dim: DataFrame,
      naturalKeys: Seq[String],
      keyName: String): DataFrame = {
    val missing = naturalKeys.filterNot(fact.columns.contains)
    if (missing.nonEmpty) {
      // P4: absent natural keys -> null surrogate key, drop what is present.
      val present = naturalKeys.filter(fact.columns.contains)
      return fact.withColumn(keyName, lit(null).cast("long"))
        .drop(present: _*)
    }
    val jk = "__join_key__"
    val dimKeyed = dim
      .withColumn(jk, concat_ws("|", naturalKeys.map(col(_).cast("string")): _*))
      .select(jk, keyName)
      // collision-avoid drop (key_mapper.py:36): one key row per join key
      .dropDuplicates(jk)
    val factKeyed = fact
      .withColumn(jk, concat_ws("|", naturalKeys.map(col(_).cast("string")): _*))
    factKeyed
      .join(broadcast(dimKeyed), Seq(jk), "left")
      .drop(jk)
      .drop(naturalKeys: _*)
  }
}
