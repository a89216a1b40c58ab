package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps.tokens

/** Distributed BPE (byte-pair-encoding) merge-table training — the
  * tokenizer-prep stage of a training-data pipeline.
  *
  * Scale shape: the corpus is scanned ONCE into a word-frequency table
  * (groupBy word — the only pass whose width scales with data volume;
  * tokens shuffle as (word, count) pairs). Every merge iteration then runs
  * on the distinct-word table, which is bounded by vocabulary size, not
  * corpus size — exactly how production BPE trainers handle trillion-token
  * corpora. Per iteration: adjacent-pair explode → partial-agg count →
  * TakeOrdered(1) argmax (ties broken lexicographically, so the table is
  * deterministic) → a one-row collect steers the next map-side fold merge.
  * The driver holds k rows total; the corpus is never collected.
  *
  * The merge fold is a pure `aggregate` higher-order expression (greedy
  * left-to-right, matching the reference BPE formulation): no UDF, stays
  * in codegen. Lineage is truncated each round with localCheckpoint, the
  * same loop idiom as [[Graph.pageRank]] / [[Clustering]].
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (l, r) into l+r over a symbol
    * array: fold that either extends the last element or appends.
    */
  private def mergeFold(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && last === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x)))
    })

  /** Train `merges` BPE merges over the whitespace tokens of `docs(text)`.
    * Returns the merge table: (merge_rank, left, right, pair_freq).
    */
  def train(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.GraftFunctions.ensureRegistered(spark)

    // one corpus-wide pass: word frequencies, then chars as the seed symbols
    var words = docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("sym"), col("freq"))
      .localCheckpoint()

    val table = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      // guard: sequence(0, -1) DESCENDS for single-symbol words, producing
      // index 0 — words fully merged into one token contribute no pairs
      val adjacent = when(size(col("sym")) >= 2,
        transform(sequence(lit(0), size(col("sym")) - 2),
          i => struct(element_at(col("sym"), i + 1).as("l"),
            element_at(col("sym"), i + 2).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val pairs = words
        .select(explode(adjacent).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      pairs.headOption match {
        case Some((l, r, n)) =>
          table += ((rank, l, r, n))
          val prev = words
          words = words.select(mergeFold(col("sym"), l, r).as("sym"),
            col("freq")).localCheckpoint()
          prev.unpersist()
          rank += 1
        case None => done = true // no adjacent pairs left anywhere
      }
    }
    words.unpersist() // merge table lives on the driver; free the last checkpoint
    spark.createDataFrame(table.result())
      .toDF("merge_rank", "left", "right", "pair_freq")
      .orderBy("merge_rank")
  }
}
