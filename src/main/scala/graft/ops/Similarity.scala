package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps.seededHash

/** Similarity search over embedding columns (SURVEY §7.6): brute-force
  * cosine top-k as the exactness baseline, and random-hyperplane LSH
  * bucketing as the 100 TB path (candidates only meet inside a bucket, so
  * the join is bucket-keyed instead of an n² cross join).
  *
  * All vector math is higher-order functions over `array<float>`
  * (`zip_with` + `aggregate`) — whole-stage-codegen'd, no UDFs, no explode
  * in the hot path. Cosines are rounded to 6 dp before any ranking or
  * thresholding so float summation order can never flip a comparison.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Exact top-k neighbors for a small query set (vec_id < nQueries):
    * broadcast the queries, rank by rounded cosine with vec_id tie-break.
    * Exactness baseline — cost is |Q| × N, linear in the corpus.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane sketch: bit p = sign of <v, h_p> where hyperplane
    * h_p has components ±1 derived from the seeded hash of (p, i) — a
    * public construction the oracle reproduces. Projections are rounded
    * before the sign test so summation order can't flip a boundary bit.
    */
  def lshBucket(v: Column, bits: Int): Column = {
    val dims = 64
    val bitCols = (0 until bits).map { p =>
      // component sign for (plane p, dim i): +1 if seeded hash is even
      val proj = aggregate(
        zip_with(v,
          transform(sequence(lit(0), lit(dims - 1)),
            i => when(seededHash(p, i) % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))),
          (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x)
      when(round(proj, 6) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** ANN via LSH buckets: queries probe only their own bucket, then exact
    * rounded-cosine ranking inside it. Recall < 1 by design; the join is
    * bucket-keyed so at 100 TB each task sees ~N/2^bits candidates.
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 3,
      bits: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col("embedding"), bits))
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qbucket"))
    val pairs = bucketed.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Embedding near-dup pairs, LSH-blocked: pairs only form inside a
    * 4-bit bucket (the blocking key), then exact rounded cosine >=
    * threshold. The 100 TB shape for "find semantic duplicates".
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.35,
      bits: Int = 4): DataFrame = {
    val bucketed = emb
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), bits).as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
