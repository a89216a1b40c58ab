package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftFunctions, Tables}
import graft.ops.Dedup

/** Per-rung probe for the simhash block ladder: forces EACH rung over the
  * same corpus and reports candidates / true (hamming≤3) pairs /
  * cross-replica pairs side by side, plus the rung the adaptive rule
  * would pick. This is the measurement that set [[Dedup.SimhashTargetPerDoc]]:
  * at 50k shift-mode docs B=4 emitted 3.61M candidates (72/doc — ~24×
  * the uniform-model floor, because real fingerprints have correlated
  * bit biases) while B=8 emitted 74k, zeroed the cross-replica floor,
  * and kept all 8,710 true pairs. True-pair counts MUST be identical
  * across rungs (pigeonhole-exact recall at every rung).
  *
  * Usage: SimhashProbe [sfDir]
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.ensureRegistered(spark)
    val docs = Tables.read(spark, dir, "documents")
    val n = docs.count()
    println(s"docs=$n rule-B=${Dedup.simhashNumBlocks(n)}")
    for (b <- Dedup.SimhashBlockLadder) {
      val c = Dedup.simhashCandidates(docs, forceBlocks = Some(b))
      val r = c.agg(count(lit(1)),
        sum(when(col("hamming") <= Dedup.SimhashMaxHamming, 1L)
          .otherwise(0L)),
        sum(when(floor(col("doc_a") / 1e8) =!= floor(col("doc_b") / 1e8),
          1L).otherwise(0L))).head()
      println(s"B=$b candidates=${r.getLong(0)} " +
        s"ham<=${Dedup.SimhashMaxHamming}=${r.getLong(1)} " +
        s"cross=${r.getLong(2)}")
    }
    spark.stop()
  }
}
