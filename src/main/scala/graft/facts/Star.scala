package graft.facts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{KeyMapper, Normalize, Tables, TimeParse}
import graft.dims.{NationDim, PartDim, SupplierDim}

/** Fact-side pipeline (reference §3.1 stages 6-7): clean raw fact, stamp
  * surrogate keys from the transformed dims, project to the final fact
  * schema. Retargeted to the testdata star (FIXTURES.md role mapping):
  * `lineitem` plays the 311/parking fact, `part`/`supplier`/`nation⋈region`
  * play the dims.
  */
object Star {

  /** Raw enriched fact: lineitem with its dims' natural-key attribute columns
    * materialized (the reference's raw rows arrive with these attributes
    * in-line; testdata normalizes them into side tables, so we join them back
    * to reconstruct the "raw" denormalized shape).
    */
  def rawFact(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
    val part = Tables.read(spark, dir, "part")
      .select("p_partkey", "p_brand", "p_type")
    val supp = Tables.read(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
    val nation = Tables.read(spark, dir, "nation")
    val region = Tables.read(spark, dir, "region")
    val natReg = nation
      .join(region, nation("n_regionkey") === region("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(natReg), supp("s_nationkey") === natReg("n_nationkey"))
      .drop("p_partkey", "s_suppkey", "s_nationkey", "n_nationkey")
  }

  /** Stage-6/7 analog: normalize natural keys, build the three dims, stamp
    * their surrogate keys onto the fact (three broadcast left joins), derive
    * date/time keys, project the final fact schema (main.py:106-145).
    */
  def buildFact(spark: SparkSession, dir: String): DataFrame = {
    val naturalCols =
      PartDim.naturalCols ++ SupplierDim.naturalCols ++ NationDim.naturalCols
    val raw = Normalize.normalizeStrings(rawFact(spark, dir), naturalCols)
    val partDim = PartDim.transform(
      raw.select(PartDim.naturalCols.map(col): _*).dropDuplicates())
    val suppDim = SupplierDim.transform(
      raw.select(SupplierDim.naturalCols.map(col): _*).dropDuplicates())
    val natDim = NationDim.transform(
      raw.select(NationDim.naturalCols.map(col): _*).dropDuplicates())

    val stamped = Seq(
      (partDim, PartDim.naturalCols, PartDim.keyName),
      (suppDim, SupplierDim.naturalCols, SupplierDim.keyName),
      (natDim, NationDim.naturalCols, NationDim.keyName))
      .foldLeft(raw) { case (fact, (dim, keys, keyName)) =>
        KeyMapper.assignKeys(fact, dim, keys, keyName)
      }
    stamped
      .withColumn("ship_date_key", TimeParse.dateKey(col("l_shipdate")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "ship_date_key", "part_key", "supplier_key", "nation_key")
  }
}
