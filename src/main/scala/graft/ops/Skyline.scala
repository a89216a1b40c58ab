package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SKYLINE (Pareto frontier) operator: rows not dominated on (minimize
  * `priceCol`, maximize `sizeCol`) — b dominates a iff b is ≤ on price,
  * ≥ on size, and strictly better in one. Decomposes into two Spark-sized
  * phases instead of the naive O(n²) self-join:
  *   1. one map-side-combined aggregate to (size → min price) — the frame
  *      is |distinct size| rows, DOMAIN-bounded (50 in TPC-H; any physical
  *      dimension is ≤ thousands), not data-bounded;
  *   2. a descending-size sweep over that tiny frame: size s survives iff
  *      its min price strictly beats the running min over larger sizes;
  *   3. a broadcast join back stamps every tied row on the frontier.
  * Correctness of the reduction: any dominator is itself dominated-or-
  * equaled by its size's (size, min-price) representative, so dominance
  * against the |sizes|-row representative frame ⟺ dominance against all
  * n rows.
  */
object Skyline {

  def paretoFront(df: DataFrame, sizeCol: String, priceCol: String,
      keep: Seq[String]): DataFrame = {
    val bySize = df.groupBy(sizeCol).agg(min(priceCol).as("minp"))
    val wPrev = Window.orderBy(col(sizeCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = bySize
      .withColumn("mplus", min(col("minp")).over(wPrev))
      .filter(col("mplus").isNull || col("minp") < col("mplus"))
      .select(col(sizeCol).as("f_size"), col("minp"))
    df.join(broadcast(frontier),
        df(sizeCol) === frontier("f_size") && df(priceCol) === frontier("minp"))
      .select(keep.map(col): _*)
  }
}
