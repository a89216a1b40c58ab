package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps._

/** Distributed document-quality classifier: logistic-style regression
  * trained by full-batch gradient descent over cheap text features — the
  * standard "bootstrap a quality model from a rule, then replace the rule"
  * curation step (labels come from a deterministic heuristic; the trained
  * model generalizes it to a continuous score).
  *
  * Every quantity is FIXED-POINT INTEGER (ppm scale), including the link
  * function: instead of exp-based sigmoid (whose libm ulps differ across
  * engines) the model uses the algebraic fast sigmoid
  * `p = 1/2 + m / (2(1+|m|))` — one integer multiply + one truncating
  * division, bit-identical in Spark (`div`) and DuckDB (`//`). Gradient
  * sums accumulate in DECIMAL(38,0) (exact, order-independent; a long sum
  * would wrap at ~1e9 rows × 5e11/row), then one truncating div by N and
  * the learning-rate scale. The whole train is therefore bit-reproducible
  * across engines AND across partitionings.
  *
  * Scale shape per iteration: ONE corpus-sized pass — margin + error are
  * per-row expressions against the broadcast 1-row weight frame, and the
  * gradient is a single global aggregate (map-side partials, d+1 columns of
  * shuffle). Weights never exceed one row; iteration count never touches
  * anything but that row between passes. The feature build is one map-side
  * projection, localCheckpoint'd so k iterations don't re-tokenize.
  */
object Classifier {

  /** ppm fixed-point scale. */
  private val S = 1000000L

  /** Weak-supervision label threshold (ppm): y = 1 when the linear blend
    * `5·stopword_ratio + alpha_ratio` (the existing quality_score shape,
    * integer form) clears 0.97 — splits the documents corpus ~50/50 and
    * is linearly representable, so GD measurably learns it. Shared with
    * the oracle builder so the two sides can't drift.
    */
  val BlendThrPpm = 970000L

  /** Integer text features: raw ppm ratios (stopword ratio, alpha ratio,
    * avg-token-length capped at 10 chars, length capped at 2000 chars)
    * min/max-normalized to [-1e6, 1e6] with one exact integer aggregate —
    * raw ratios cluster far from any fixed center (stopword ratios sit
    * near 3%), so without per-corpus normalization every feature is a
    * near-constant collinear with the bias and GD stalls. All divisions
    * truncating-integral; the normalization agg is one metadata-sized
    * broadcast.
    */
  private[graft] def features(docs: DataFrame): DataFrame = {
    val t = col("t")
    val raw = withTokens(docs)
      .withColumn("n_chars_", greatest(length(col("text")).cast("long"), lit(1L)))
      .withColumn("n_tokens", greatest(size(t).cast("long"), lit(1L)))
      .withColumn("sum_tok_len",
        aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("long"))
      .withColumn("stop_hits", stopHits(t, StopEn).cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .select(
        col("doc_id"),
        expr(s"(stop_hits * $S) div n_tokens").as("r1"),
        expr(s"(n_alpha * $S) div n_chars_").as("r2"),
        expr(s"(least(sum_tok_len div n_tokens, 10) * $S) div 10").as("r3"),
        expr(s"(least(n_chars_, 2000) * $S) div 2000").as("r4"),
        when(expr(s"5 * ((stop_hits * $S) div n_tokens) + " +
          s"(n_alpha * $S) div n_chars_") >= lit(BlendThrPpm), lit(1L))
          .otherwise(lit(0L)).as("y"))
    val rngCols = (1 to 4).flatMap(j =>
      Seq(min(col(s"r$j")).as(s"mn$j"), max(col(s"r$j")).as(s"mx$j")))
    val rng = raw.agg(rngCols.head, rngCols.tail: _*)
    raw.crossJoin(broadcast(rng))
      .select(col("doc_id") +: col("y") +:
        (1 to 4).map(j =>
          expr(s"((r$j - mn$j) * ${2 * S}) div (mx$j - mn$j + 1) - $S")
            .as(s"x$j")): _*)
  }

  /** margin (ppm) of one row against weight columns w0..w4. */
  private def margin: Column =
    expr(s"(w0 * $S + w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4) div $S")

  /** fast sigmoid in ppm: 5e5 + m*5e5 div (1e6 + |m|) — integer multiply
    * + truncating `div` only (a double `/` here could flip a boundary
    * value vs the oracle's integer `//`).
    */
  private def probPpm: Column =
    expr(s"${S / 2} + (m * ${S / 2}) div ($S + abs(m))")

  /** Train `iters` full-batch GD steps (learning rate = `lrPpm`/1e6) and
    * score every document: (doc_id, y, score_ppm, pred). Deterministic,
    * engine-exact; see the object doc for the arithmetic contract.
    */
  def trainAndScore(docs: DataFrame, iters: Int = 8,
      lrPpm: Long = 3000000L): DataFrame = {
    require(iters >= 1, s"trainAndScore needs at least one iteration: $iters")
    val fx = features(docs).localCheckpoint()

    // weights: ONE row (w0 bias + w1..w4), ppm
    var w = fx.sparkSession.range(1)
      .select((0 to 4).map(j => lit(0L).as(s"w$j")): _*)

    for (_ <- 1 to iters) {
      val withP = fx.crossJoin(broadcast(w))
        .withColumn("m", margin)
        .withColumn("p", probPpm)
        .withColumn("e", col("y") * lit(S) - col("p"))
      // exact decimal gradient sums; one global agg, map-side partials
      val grads = withP.agg(
        sum(col("e").cast("decimal(38,0)")).as("g0"),
        sum((col("e") * col("x1")).cast("decimal(38,0)")).as("g1"),
        sum((col("e") * col("x2")).cast("decimal(38,0)")).as("g2"),
        sum((col("e") * col("x3")).cast("decimal(38,0)")).as("g3"),
        sum((col("e") * col("x4")).cast("decimal(38,0)")).as("g4"),
        count(lit(1)).as("n"))
      // w_j += lr * avg(e * x_j) / S  — every step truncating, mirrored
      // 1:1 in the oracle CTEs. g0's x is the implicit bias input S.
      // The lr multiply runs in DECIMAL(38,0): `div` yields BIGINT (peak
      // |avg grad·S| ~1e12), and a bare int64 product would silently
      // wrap for lrPpm above ~9.2e6 while the oracle's HUGEINT path
      // doesn't — widening makes the two engines agree at ANY lr instead
      // of only below the wrap point. The outer `div` lands back in
      // BIGINT weight range.
      val wcols = expr(s"""w0 + (CAST($lrPpm AS DECIMAL(38,0))
          | * ((g0 * $S) div n)) div ${S * S}""".stripMargin)
        .cast("long").as("w0") +:
        (1 to 4).map(j =>
          expr(s"""w$j + (CAST($lrPpm AS DECIMAL(38,0))
              | * (g$j div n)) div ${S * S}""".stripMargin)
            .cast("long").as(s"w$j"))
      w = w.crossJoin(broadcast(grads)).select(wcols: _*)
        .localCheckpoint() // 1 row; truncate the iterative lineage
    }

    fx.crossJoin(broadcast(w))
      .withColumn("m", margin)
      .withColumn("score_ppm", probPpm)
      .select(col("doc_id"), col("y"), col("score_ppm"),
        (col("score_ppm") >= lit(S / 2)).cast("boolean").as("pred"))
      .orderBy("doc_id")
  }
}
