package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the corpus
  * clustering step of a training-data pipeline (topic balancing, IVF
  * coarse-quantizer training, dedup blocking).
  *
  * Every quantity that feeds the argmin assignment is EXACT DECIMAL:
  * coordinates quantize once to DECIMAL(12,8) at explode time, and dot
  * products / centroid norms are decimal sums (order-independent, no
  * float partial-sum nondeterminism) — so the cluster decisions are
  * bit-reproducible across engines and across partitionings. Doubles
  * appear only in the per-dim mean (then re-quantized) and the reported
  * norm.
  *
  * Scale shape per iteration: one (dim)-keyed join of the exploded corpus
  * against the k×dims centroid frame (broadcast — centroids are tiny), a
  * (vec, cluster) partial agg for dots, a window argmin per vector, and a
  * (cluster, dim) partial agg for the new means. The corpus never
  * collects; centroid frames are the only small side. Init = the k
  * smallest vec_ids by default, or kmeans||-style salted-hash sampling
  * when an `initSeed` is given — both deterministic (see [[seedIds]]).
  */
object Clustering {

  /** The k seed vector ids for init. Default (no seed): the k SMALLEST
    * vec_ids — ids need not be dense or zero-based; TakeOrdered pulls the
    * k minima without a global sort. With a seed: kmeans||-style
    * deterministic sampling — the k ids with the smallest salted hash
    * (same device as [[Sampling]]), which spreads the seeds uniformly
    * over the corpus instead of taking whatever happens to sort first.
    * Either way the pick is a k-row TakeOrdered: no collect, no RNG
    * state, reproducible across partitionings.
    */
  private[graft] def seedIds(emb: DataFrame, k: Int,
      initSeed: Option[Long]): DataFrame = {
    val ids = emb.select("vec_id").distinct()
    val picked = initSeed match {
      case Some(seed) =>
        ids.orderBy(xxhash64(lit(seed), col("vec_id")), col("vec_id")).limit(k)
      case None => ids.orderBy("vec_id").limit(k)
    }
    // cluster index 0..k-1 by ascending vec_id — a window over k rows
    picked.withColumn("cluster",
      (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
  }

  /** Fit internals: (exploded corpus, final assignment, final centroids).
    * Shared by the reported summary and the cost diagnostic.
    */
  /** The shared exploded-decimal vector space: one row per (vec, dim),
    * components quantized to DECIMAL(12,8) so every downstream sum is
    * order-independent and bit-identical to the DuckDB oracle.
    */
  private[graft] def explodeDecimal(emb: DataFrame): DataFrame =
    // moderate spread (quarter width): the explode materialization was a
    // serialized 0.3-0.9 s single task per call on a one-partition scan,
    // but its MANY cheap downstream consumer stages pay a fixed per-task
    // cost — full shuffle-width spread measured WORSE (kmeans 2.1→3.0 s,
    // 277 tasks of overhead); width/4 parallelizes the explode without
    // the task-count blowup. No-op on already-wide scans.
    graft.core.Parallelism.spread(emb, col("vec_id"),
        emb.sparkSession.sessionState.conf.numShufflePartitions / 4)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        col("x").cast("double").cast("decimal(12,8)").as("xq"))
      .localCheckpoint()

  private[graft] def kmeansFit(emb: DataFrame, k: Int, iters: Int,
      initSeed: Option[Long]): (DataFrame, DataFrame, DataFrame) = {
    require(iters >= 1, s"kmeansLloyd needs at least one iteration, got $iters")
    // the exploded corpus is read 2× per iteration (dots + means) plus the
    // init join — materialize it once (MEMORY_AND_DISK; measured −25% at
    // sf0.1). At 100 TB flip this to a plain lazy frame: re-running the
    // map-side explode is cheaper than spilling the materialization.
    val ex = explodeDecimal(emb)

    // cen is k×dims rows and assign one row per vector; localCheckpoint
    // both each round so the iterative lineage never re-executes prior
    // rounds (cen is referenced 3× per iteration — uncheckpointed, each
    // reference replays the whole history)
    var cen = ex.join(broadcast(seedIds(emb, k, initSeed)), "vec_id")
      .select(col("cluster"), col("dim"), col("xq").as("cd"))
      .localCheckpoint()
    var assign: DataFrame = null

    for (_ <- 0 until iters) {
      val cnorm = cen.groupBy("cluster")
        .agg(sum(col("cd") * col("cd")).as("cnorm"))
      val dots = ex.join(broadcast(cen), "dim")
        .groupBy("vec_id", "cluster")
        .agg(sum(col("xq") * col("cd")).as("dot"))
      // squared distance ranking: ||x||^2 is constant per vector, so
      // argmin(||c||^2 - 2 x·c) — exact decimal, ties to the lowest cluster
      val rn = row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("cnorm") - lit(2) * col("dot"), col("cluster")))
      assign = dots.join(broadcast(cnorm), "cluster")
        .withColumn("rn", rn).filter(col("rn") === 1)
        .select("vec_id", "cluster")
        .localCheckpoint()
      cen = ex.join(assign, "vec_id")
        .groupBy("cluster", "dim")
        .agg((sum(col("xq")).cast("double") / count(lit(1)))
          .cast("decimal(12,8)").as("cd"))
        .localCheckpoint()
    }
    (ex, assign, cen)
  }

  /** Exact within-cluster sum of squared distances of a fit — the
    * quantity a better init should shrink. One join + one agg over the
    * exploded corpus.
    */
  private[graft] def kmeansCost(fit: (DataFrame, DataFrame, DataFrame)): Double = {
    val (ex, assign, cen) = fit
    ex.join(assign, "vec_id").join(cen, Seq("cluster", "dim"))
      .select(
        sum(pow(col("xq").cast("double") - col("cd").cast("double"), 2))
          .as("cost"))
      .head.getDouble(0)
  }

  /** Dominant principal direction of the embedding corpus (uncentered
    * PCA — the top right-singular vector of the data matrix) by power
    * iteration over the normalized Gram matrix G = XᵀX/N, plus the
    * matching eigenvalue estimate.
    *
    * Scale shape: the ONLY data-volume pass is the Gram build — a
    * map-side double-explode of each row into its 64×64 outer-product
    * cells followed by one partial-aggregable (i,j) sum, so the shuffle
    * carries at most 4096 partials per task regardless of corpus size
    * (no self-join of the exploded corpus). Every iteration then runs on
    * the 4096-row Gram frame: a 64-row vector join + sum, a 1-row
    * max-abs, and a re-quantized projection — constant work, so iteration
    * count never touches the corpus again.
    *
    * Determinism: coordinates quantize to DECIMAL(12,8) at explode, Gram
    * cells are exact decimal sums re-quantized once after the /N (the
    * same idiom as the Lloyd centroid means), and each iterate is
    * max-abs-normalized (max of exact decimals — order-independent,
    * no sqrt) with one double division re-quantized to DECIMAL(12,8).
    * Bit-identical across engines and partitionings; the max-magnitude
    * dimension's loading is exactly ±1. `eig_est` is the last growth
    * factor max|G·v| ≈ λ once v has converged.
    */
  def pcaPowerTop(emb: DataFrame, iters: Int = 4,
      driverIterateMaxDims: Int = 256): DataFrame = {
    require(iters >= 1, s"pcaPowerTop needs at least one iteration, got $iters")
    val q = (c: Column) => c.cast("double").cast("decimal(12,8)")
    val nRows = emb.agg(count(lit(1)).as("n"))
    // G is symmetric: generate only the upper triangle (slice from i —
    // half the exploded rows and half the decimal multiplies) and mirror
    // the off-diagonal cells afterwards. Cell values are exact decimal
    // sums, so the mirrored matrix is bit-identical to a full build and
    // the oracle (which builds the full Gram) needs no change.
    //
    // The triangle build is the query's data-volume pass — dims²/2 decimal
    // multiplies per row — and a single-file corpus arrives as ONE scan
    // partition, serializing all of it on one core (measured ~9 s of task
    // time at ≤2-way parallelism = ~5 s of the query's 5.6 s wall at
    // sf0.1). Spread it before exploding; decimal sums are
    // order-independent, so the result is bit-identical (guide §2.5).
    val upper = graft.core.Parallelism.spread(emb, col("vec_id"))
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("i"), q(col("xi")).as("xi"),
        posexplode(expr("slice(embedding, i + 1, size(embedding))"))
          .as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        (col("xi") * q(col("xj"))).as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("g"))
      .crossJoin(broadcast(nRows))
      .select(col("i"), col("j"),
        (col("g").cast("double") / col("n")).cast("decimal(12,8)").as("g"))
    val gram = upper
      .unionByName(upper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("g")))

    // The Gram matrix is dims²-bounded — 4096 cells at width 64 —
    // independent of corpus size: the same bounded-artifact class as the
    // BPE merge table. The data-volume work is the ONE distributed pass
    // above; iterating the constant-size matrix through Spark jobs buys
    // nothing but per-job scheduling overhead (measured ~3 s of the
    // query's 5.3 s at sf0.1), so for ordinary widths the power loop
    // runs driver-side in EXACT decimal arithmetic replicating the
    // engine's cast/round semantics step for step (BigDecimal products
    // and sums are exact; double division and HALF_UP quantization
    // mirror Cast/Round) — bit-identical output, proven by the unchanged
    // oracle and the both-paths-equal spec. Very wide embeddings
    // (dims > driverIterateMaxDims) keep the distributed loop.
    // Degenerate-input guards (round-6 advice): an EMPTY corpus must not
    // throw at the width probe (the distributed branch yields an empty
    // frame — mirror that), and an all-zero corpus makes max|u| = 0, where
    // dividing would mint NaN and JBD.valueOf(NaN) throws (the distributed
    // branch nulls out through NaN→decimal casts — mirror with null rows).
    val firstWidth =
      emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head(1)
    val spark0 = emb.sparkSession
    import spark0.implicits._
    if (firstWidth.isEmpty) {
      Seq.empty[(Long, Option[Double], Option[Double])]
        .toDF("dim", "loading", "eig_est")
    } else if (firstWidth(0).getInt(0) <= driverIterateMaxDims) {
      val width = firstWidth(0).getInt(0)
      import java.math.{BigDecimal => JBD, RoundingMode}
      val cells = gram.collect().map { r =>
        ((r.getInt(0), r.getInt(1)), r.getDecimal(2))
      }.toMap
      def quantize(d: Double): JBD =
        JBD.valueOf(d).setScale(8, RoundingMode.HALF_UP)
      def round6(d: Double): Double =
        JBD.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue
      var v: Array[JBD] = Array.fill(width)(new JBD("1.00000000"))
      var m: JBD = null
      var degenerate = false
      for (_ <- 1 to iters if !degenerate) {
        val u = Array.tabulate(width) { i =>
          (0 until width).foldLeft(JBD.ZERO) { (acc, j) =>
            cells.get((i, j)).fold(acc)(g => acc.add(g.multiply(v(j))))
          }
        }
        m = u.map(_.abs).max
        if (m.signum == 0) degenerate = true
        else v = u.map(ui => quantize(ui.doubleValue / m.doubleValue))
      }
      if (degenerate)
        (0 until width).map(j => (j.toLong, None: Option[Double],
            None: Option[Double]))
          .toDF("dim", "loading", "eig_est").orderBy("dim")
      else
        (0 until width).map(j =>
            (j.toLong, Some(round6(v(j).doubleValue)),
              Some(round6(m.doubleValue))))
          .toDF("dim", "loading", "eig_est")
          .orderBy("dim")
    } else {
      val g2 = gram.localCheckpoint() // dims² rows, referenced per iteration
      var v = g2.select(col("j")).distinct()
        .select(col("j"), lit(1).cast("decimal(12,8)").as("v"))
      var growth: DataFrame = null
      for (_ <- 1 to iters) {
        val u = g2.join(broadcast(v), "j")
          .groupBy("i").agg(sum(col("g") * col("v")).as("u"))
          .localCheckpoint() // dims rows; truncate the iterative lineage
        growth = u.agg(max(abs(col("u"))).as("m"))
        v = u.crossJoin(broadcast(growth))
          .select(col("i").as("j"),
            (col("u").cast("double") / col("m").cast("double"))
              .cast("decimal(12,8)").as("v"))
      }
      // Degenerate (all-zero) corpus: the loadings already null out (0/0
      // is NaN, NaN→decimal is null under non-ANSI), but at iters=1 the
      // growth scalar itself is decimal ZERO, not null — round() would
      // surface eig_est=0.0 while the driver branch nulls both columns.
      // The when-guard keeps the two paths' degenerate rows identical.
      v.crossJoin(broadcast(growth))
        .select(col("j").cast("long").as("dim"),
          round(col("v").cast("double"), 6).as("loading"),
          when(col("m") === 0, lit(null).cast("double"))
            .otherwise(round(col("m").cast("double"), 6)).as("eig_est"))
        .orderBy("dim")
    }
  }

  def kmeansLloyd(emb: DataFrame, k: Int, iters: Int,
      initSeed: Option[Long] = None): DataFrame = {
    val (_, assign, cen) = kmeansFit(emb, k, iters, initSeed)

    val norms = cen.groupBy("cluster")
      .agg(round(sqrt(sum(col("cd") * col("cd")).cast("double")), 6)
        .as("centroid_norm"))
    assign.groupBy("cluster").agg(count(lit(1)).as("n_members"))
      .join(broadcast(norms), "cluster")
      .select(col("cluster").cast("long").as("cluster"), col("n_members"),
        col("centroid_norm"))
      .orderBy("cluster")
  }
}
