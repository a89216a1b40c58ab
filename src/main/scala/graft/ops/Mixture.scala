package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture rebalancing for training-data assembly: given a sampling
  * budget of total/`budgetDiv` documents and a uniform per-source target,
  * allocate by two-pass water-filling — round 1 gives each source
  * min(avail, budget/|sources|); round 2 redistributes the round-1
  * leftover proportionally to remaining capacity. The fractional share is
  * computed in DOUBLE then floored, so the arithmetic cannot overflow
  * int64 at 100 TB corpus counts where leftover × capacity products pass
  * 2⁶³. Everything downstream of the one per-source aggregate is
  * |sources|-row arithmetic against broadcast 1-row totals — the
  * operator's data cost is a single map-side-combined groupBy at any
  * scale.
  */
object Mixture {

  /** Per-source (source, avail, alloc, rate) under the uniform-target
    * two-pass water-filling allocation.
    */
  def solve(docs: DataFrame, budgetDiv: Int = 10): DataFrame = {
    val avail = docs.groupBy("source").agg(count(lit(1)).as("avail"))
    val tot = avail.agg(sum(col("avail")).as("total"),
      count(lit(1)).as("nsrc"))
    val r1 = avail.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"total div $budgetDiv"))
      .withColumn("fair", expr(s"(total div $budgetDiv) div nsrc"))
      .withColumn("a1", least(col("avail"), col("fair")))
      .withColumn("cap", col("avail") - least(col("avail"), col("fair")))
    val t2 = r1.agg(sum(col("a1")).as("s1"), sum(col("cap")).as("scap"))
    r1.crossJoin(broadcast(t2))
      .withColumn("a2", when(col("scap") > 0,
        least(col("cap"),
          floor((col("budget") - col("s1")).cast("double") *
            col("cap") / col("scap"))))
        .otherwise(lit(0L)))
      .withColumn("alloc", col("a1") + col("a2"))
      .withColumn("rate", round(
        col("alloc").cast("double") / col("avail").cast("double"), 6))
      .select(col("source"), col("avail"), col("alloc"), col("rate"))
      .orderBy("source")
  }

  /** RAKING (iterative proportional fitting): per-cell sampling weights
    * that make the weighted (lang × source) marginals match uniform
    * targets — the survey-statistics calibration a curation pipeline runs
    * when it must hit BOTH a language mix and a source mix at once (the
    * 1-D temperature sampler can't satisfy two marginals simultaneously).
    *
    * IPF operates on the contingency CELL table — |lang|·|source| rows,
    * metadata scale — so the corpus is touched exactly once (the count
    * aggregate); each iteration alternates row- and column-scaling
    * windows over the cell frame. Cross-engine exactness: per-cell math
    * is double with an identical operation sequence, each scale step
    * rounds the weight to 12 dp, and every cross-cell marginal sum rides
    * DECIMAL (round-then-cast, so the sum is order-independent) — the
    * profile-family discipline applied to an iterative fixed point.
    */
  def rake(docs: DataFrame, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val tot = cells.agg(sum(col("n")).as("total"),
      countDistinct(col("lang")).as("nl"),
      countDistinct(col("source")).as("ns"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val wL = Window.partitionBy("lang")
    val wS = Window.partitionBy("source")
    var w = cells.crossJoin(broadcast(tot)).withColumn("w", lit(1.0))
    for (_ <- 1 to iters) {
      w = w
        .withColumn("msum", d(sum(round(col("w") * col("n"), 12)
          .cast("decimal(28,12)")).over(wL)))
        .withColumn("w", round(col("w") *
          ((d(col("total")) / d(col("nl"))) / col("msum")), 12))
        .drop("msum")
        .withColumn("msum", d(sum(round(col("w") * col("n"), 12)
          .cast("decimal(28,12)")).over(wS)))
        .withColumn("w", round(col("w") *
          ((d(col("total")) / d(col("ns"))) / col("msum")), 12))
        .drop("msum")
    }
    w.select(col("lang"), col("source"), col("n").as("n_docs"),
        round(col("w"), 6).as("weight"))
      .orderBy("lang", "source")
  }
}
