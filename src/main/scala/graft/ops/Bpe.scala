package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps.tokens

/** Distributed BPE (byte-pair-encoding) merge-table training — the
  * tokenizer-prep stage of a training-data pipeline.
  *
  * Scale shape: the corpus is scanned ONCE into a word-frequency table
  * (groupBy word — the only pass whose width scales with data volume;
  * tokens shuffle as (word, count) pairs). Every merge round then runs
  * on the distinct-word table, which is bounded by vocabulary size, not
  * corpus size — exactly how production BPE trainers handle trillion-token
  * corpora.
  *
  * Driver round-trips are the scale bottleneck of the naive loop (one
  * argmax job per merge → a 32k-merge vocabulary is 32k serial jobs), so
  * [[train]] batches merges per round under a PROVABLY-EXACT rule (same
  * merge table as the serial trainer, cross-checked by BpeSpec), and
  * [[trainFast]] offers the standard skip-conflict batching used by
  * distributed trainers when bit-identical serial order isn't required.
  *
  * Per round: adjacent-pair explode → partial-agg count → TakeOrdered(k)
  * (ties broken lexicographically, so the table is deterministic) → a
  * k-row collect steers the next map-side fold merges. The driver holds
  * O(k + merges) rows total; the corpus is never collected. Lineage is
  * truncated each round with a LAZY localCheckpoint that materializes
  * inside the next round's count job (one job per round, the
  * [[Dedup.lssComponents]] idiom).
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

  /** One corpus-wide pass: word frequencies, chars as the seed symbols. */
  private def seedWords(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("sym"), col("freq"))

  /** Adjacent symbol pairs; guard: `sequence(0, -1)` DESCENDS for
    * single-symbol words — fully-merged words contribute no pairs.
    */
  private val adjacentPairs: Column =
    when(size(col("sym")) >= 2,
      transform(sequence(lit(0), size(col("sym")) - 2),
        i => struct(element_at(col("sym"), i + 1).as("l"),
          element_at(col("sym"), i + 2).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** Exact batch selection over the collected top-k pair counts: the batch
    * reproduces the serial argmax sequence bit-for-bit. Sound because:
    *   - counts of pairs symbol-DISJOINT from every applied merge are
    *     invariant under those merges (a merge only touches adjacencies
    *     involving its own symbols);
    *   - pairs sharing a symbol with the batch only DECREASE, and any such
    *     pair sorted after the candidate already lost to it;
    *   - a merge (l,r) with l≠r only creates new pairs (x,lr)/(lr,y) whose
    *     counts are bounded by existing pairs (x,l)/(r,y) — pairs that
    *     share a symbol with the batch and are NOT in it (disjointness) —
    *     so requiring the candidate's count to STRICTLY exceed that bound
    *     (and the k-th count, bounding everything uncollected) rules out
    *     any new pair overtaking it;
    *   - a self-pair merge (l==l) seeds runs ("aaa" → pair (aa,a)) bounded
    *     only by its OWN count, so the batch stops after accepting one.
    * Stop (never skip) at the first conflicting pair: its post-merge count
    * is unknowable without a recount.
    */
  private def selectBatch(top: Seq[(String, String, Long)], kth: Long,
      maxLeft: Int, maxBatch: Int): Seq[(String, String, Long)] = {
    val batch = mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = mutable.Set.empty[String]
    var open = true
    for ((l, r, n) <- top if open && batch.size < math.min(maxLeft, maxBatch)) {
      if (batch.isEmpty) {
        batch += ((l, r, n)); used += l; used += r
        if (l == r) open = false
      } else if (used(l) || used(r)) {
        open = false
      } else {
        val inBatch = batch.map(b => (b._1, b._2)).toSet
        val bound = (top.collect {
          case (ll, rr, nn) if (used(ll) || used(rr)) &&
            !inBatch((ll, rr)) => nn
        } :+ kth).max
        if (n <= bound) open = false
        else {
          batch += ((l, r, n)); used += l; used += r
          if (l == r) open = false
        }
      }
    }
    batch.toSeq
  }

  /** ENCODE with a trained merge table: every word seeds as characters
    * and the merges replay in rank order through the SAME greedy
    * left-to-right [[mergeFold]] the trainer folds with — so
    * encode(train(corpus)) reproduces the trainer's final symbol state
    * exactly (BpeSpec proves it against an independent serial encoder).
    *
    * The merge table collects to the driver — O(vocab) rows, the
    * tokenizer artifact every production system ships to workers — and
    * unrolls into a STATIC nested expression (one codegen'd projection;
    * no joins, no shuffles, no per-row interpretation of the table). A
    * 32k-merge vocabulary would switch to a broadcast trie walked in a
    * mapPartitions encoder; the per-word semantics stay this function.
    *
    * Returns (doc_id, n_words, n_chars, n_bpe_tokens, compression_ppm):
    * chars-per-token in fixed-point, the number a tokenizer team actually
    * tracks per corpus slice.
    */
  def encode(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val merges = mergeTable.orderBy("merge_rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val encoded = merges.foldLeft(chars) {
      case (sym, (l, r)) => mergeFold(sym, l, r)
    }
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .select(col("doc_id"), length(col("w")).cast("long").as("nc"),
        size(encoded).cast("long").as("nt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_bpe_tokens"))
      .withColumn("compression_ppm",
        expr("(n_chars * 1000000) div n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Train `merges` BPE merges over the whitespace tokens of `docs(text)`.
    * Returns the merge table: (merge_rank, left, right, pair_freq) —
    * bit-identical to the serial one-merge-per-round trainer, in a number
    * of Spark jobs proportional to merge ROUNDS (batch ≥ 1 per round).
    */
  def train(docs: DataFrame, merges: Int, topK: Int = 64,
      maxBatch: Int = 16): DataFrame =
    trainLoop(docs, merges, topK, maxBatch, exact = true)._1

  /** [[train]] plus the number of driver rounds it took (each round is one
    * count job; the serial trainer's round count equals `merges`).
    */
  private[graft] def trainWithRounds(docs: DataFrame, merges: Int,
      topK: Int = 64, maxBatch: Int = 16): (DataFrame, Int) =
    trainLoop(docs, merges, topK, maxBatch, exact = true)

  /** Scale mode: standard distributed-BPE batching — per round take the
    * top pairs skipping any that share a symbol with an earlier pick, and
    * apply them together. Counts are exact as of round START, so the table
    * may deviate from the strict serial order (quality-neutral in
    * practice; the standard trade on 32k-merge vocabularies, where exact
    * serial order would mean 32k driver round-trips).
    */
  def trainFast(docs: DataFrame, merges: Int, maxBatch: Int = 16): DataFrame =
    trainLoop(docs, merges, topK = 4 * maxBatch, maxBatch = maxBatch,
      exact = false)._1

  private[graft] def trainFastWithRounds(docs: DataFrame, merges: Int,
      maxBatch: Int = 16): (DataFrame, Int) =
    trainLoop(docs, merges, topK = 4 * maxBatch, maxBatch = maxBatch,
      exact = false)

  private def fastBatch(top: Seq[(String, String, Long)], maxLeft: Int,
      maxBatch: Int): Seq[(String, String, Long)] = {
    val batch = mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = mutable.Set.empty[String]
    for ((l, r, n) <- top
         if batch.size < math.min(maxLeft, maxBatch) && !used(l) && !used(r)) {
      batch += ((l, r, n)); used += l; used += r
    }
    batch.toSeq
  }

  private def trainLoop(docs: DataFrame, merges: Int, topK: Int,
      maxBatch: Int, exact: Boolean): (DataFrame, Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.GraftFunctions.ensureRegistered(spark)

    var words = seedWords(docs).localCheckpoint() // eager seed
    var prev: DataFrame = null
    val table = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var rounds = 0
    var done = false
    while (rank <= merges && !done) {
      rounds += 1
      // this count job also materializes `words`' lazy checkpoint, after
      // which the previous round's blocks are safe to drop
      val top = words
        .select(explode(adjacentPairs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(topK)
        .as[(String, String, Long)]
        .collect().toSeq
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) done = true // no adjacent pairs left anywhere
      else {
        val kth = if (top.length == topK) top.last._3 else 0L
        val batch =
          if (exact) selectBatch(top, kth, merges - rank + 1, maxBatch)
          else fastBatch(top, merges - rank + 1, maxBatch)
        batch.foreach { case (l, r, n) =>
          table += ((rank, l, r, n)); rank += 1
        }
        // all of the round's merges in ONE projection, composed in rank
        // order (disjoint, so composition == sequential application)
        val sym = batch.foldLeft(col("sym")) { case (c, (l, r, _)) =>
          mergeFold(c, l, r)
        }
        prev = words
        words = words.select(sym.as("sym"), col("freq"))
          .localCheckpoint(false) // lazy: materialized by next round's job
      }
    }
    if (prev != null) prev.unpersist()
    words.unpersist() // merge table lives on the driver; free the last ckpt
    (spark.createDataFrame(table.result())
      .toDF("merge_rank", "left", "right", "pair_freq")
      .orderBy("merge_rank"), rounds)
  }
}
