package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftFunctions
import graft.ops.TextOps._

/** Deduplication family for 100 TB training-data pipelines (SURVEY §7.6):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and LSH-blocked embedding
  * cosine. Every variant is candidate-generation-first: the only joins are
  * on hash buckets / inverted shingle lists, never an all-pairs cross join
  * (except where explicitly bounded), so the shapes survive a 1000-executor
  * scale-up — the shuffle key is always the bucket/shingle, and skew is
  * bounded by shingle frequency.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the minimum doc_id as
    * canonical. One hash-shuffle on a 64-bit-ish key; the classic first
    * pass of any dedup pipeline.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        GraftFunctions.hashKey(Seq(lower(trim(col("text"))))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_id")

  val MinhashSigs = 16
  val MinhashBands = 4 // 4 rows per band

  /** MinHash signature (16 perms) per doc over distinct word-bigram
    * shingles: one explode + one hash-aggregate — both map-side
    * combinable, no joins.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(bigramShingles(tokens(col("text")))).as("sh"))
    val aggs = (0 until MinhashSigs).map(s =>
      min(seededHash(s, col("sh"))).as(s"s$s"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: band-hash the signature 4×4, self-join on
    * (band, bandHash) to generate candidates, estimate Jaccard as the
    * fraction of matching signature components, keep est >= threshold.
    *
    * Scale: the self-join key is the band hash — tiny buckets, broadcast
    * never needed, shuffle proportional to candidate count not n².
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs)
    val sigCols = (0 until MinhashSigs).map(i => col(s"s$i"))
    val bandStructs = (0 until MinhashBands).map { b =>
      val rows = (0 until MinhashSigs / MinhashBands)
        .map(r => col(s"s${b * (MinhashSigs / MinhashBands) + r}").cast("string"))
      struct(lit(b).as("band"),
        GraftFunctions.hash64(concat_ws("|", rows: _*)).as("bh"))
    }
    val banded = sig
      .withColumn("bd", explode(array(bandStructs: _*)))
      .select(col("doc_id") +: col("bd.band").as("band") +:
        col("bd.bh").as("bh") +: sigCols: _*)
    val a = banded.as("a")
    val b = banded.as("b")
    val matches = (0 until MinhashSigs)
      .map(i => when(col(s"a.s$i") === col(s"b.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (matches.cast("double") / MinhashSigs).as("est_sim"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("est_sim") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  val SimhashBits = 48
  val SimhashBandBits = 12

  /** SimHash fingerprints (48-bit) over the token multiset: explode tokens,
    * 48 signed bit-sums in ONE hash aggregate, fold the signs back into a
    * single long. No joins, map-side combinable.
    */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
      .withColumn("th", GraftFunctions.hash64(col("tok")))
    val bitSums = (0 until SimhashBits).map(j =>
      sum(when(expr(s"(shiftright(th, $j) & 1) = 1"), 1).otherwise(-1))
        .as(s"b$j"))
    val withSums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until SimhashBits)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withSums.select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dup pairs: band the 48-bit fingerprint into 4×12-bit
    * chunks (pigeonhole: hamming<=3 guarantees a matching band; larger
    * hamming is caught probabilistically), self-join per band, keep pairs
    * with hamming <= maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val fps = simhashFingerprints(docs)
    val banded = fps.withColumn("bd",
      explode(array((0 until SimhashBits / SimhashBandBits).map(b =>
        struct(lit(b).as("band"),
          expr(s"shiftright(fp, ${b * SimhashBandBits}) & ${(1 << SimhashBandBits) - 1}")
            .as("bv"))): _*)))
      .select(col("doc_id"), col("fp"),
        col("bd.band").as("band"), col("bd.bv").as("bv"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.fp ^ b.fp)").cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram (word-bigram) Jaccard via an inverted shingle index:
    * explode distinct shingles, self-join on the shingle (candidate pairs
    * share >= 1 shingle), count intersections, Jaccard from per-doc set
    * sizes. The join key is the shingle — the classic scalable exact-Jaccard
    * shape; skew is bounded by dropping ultra-frequent shingles upstream if
    * needed.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"),
      bigramShingles(tokens(col("text"))).as("shingles"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }
}
