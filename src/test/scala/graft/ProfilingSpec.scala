package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** Profiling/heavy-hitter operators: the Misra-Gries candidate guarantee
  * and the end-to-end exactness of the approx-then-verify pipeline.
  */
class ProfilingSpec extends SparkSpec {

  test("misraGries retains every item with count > n/k") {
    // skewed stream: item i appears 2^(10-i) times, shuffled deterministically
    val xs = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"x$i"))
    val shuffled = new scala.util.Random(7).shuffle(xs)
    val n = shuffled.size
    for (k <- Seq(4, 8, 16)) {
      val cands = HeavyHitters.misraGries(shuffled.iterator, k).toSet
      val truth = xs.groupBy(identity).collect {
        case (x, occ) if occ.size.toLong * k > n => x
      }.toSet
      assert(truth.subsetOf(cands), s"k=$k lost heavy hitters ${truth -- cands}")
      assert(cands.size <= k, s"k=$k summary exceeded k counters")
    }
  }

  test("exact() equals plain groupBy-count-filter on a skewed frame") {
    import spark.implicits._
    val df = (1 to 2000).map(i => if (i % 3 == 0) "hot" else s"cold$i")
      .toDF("item").repartition(8)
    val got = HeavyHitters.exact(spark, df, "item", k = 10)
      .select("item", "cnt").as[(String, Long)].collect().toSet
    val n = 2000L
    val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10 > n)
      .as[(String, Long)].collect().toSet
    assert(got == want)
    assert(got.exists(_._1 == "hot"))
  }

  test("exact() reports a genuine NULL heavy hitter (marker no longer overloads null)") {
    import spark.implicits._
    // 40% NULLs (heavy), one hot string (heavy), long cold tail
    val df = (1 to 1000).map { i =>
      if (i % 5 <= 1) None
      else if (i % 5 <= 3) Some("hot")
      else Some(s"cold$i")
    }.toDF("item").repartition(8)
    // threshold: cnt * 4 > 1000 → both NULL (400) and "hot" (400) qualify
    val got = HeavyHitters.exact(spark, df, "item", k = 4)
      .select("item", "cnt").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map((None: Option[String]) -> 400L, Some("hot") -> 400L))
  }

  test("approxTopK certifies and equals the exact top-k on a Zipfian frame") {
    import spark.implicits._
    // Zipf-ish: item j appears ~3000/j times; k-th count far above N/m
    val rows = (1 to 50).flatMap(j => Seq.fill(3000 / j)(s"w$j"))
    val df = rows.toDF("item").repartition(8)
    val got = HeavyHitters.approxTopK(spark, df, "item", k = 10, m = 64)
      .collect()
    assert(got.forall(_.getBoolean(2)), "k-th count should clear N/m bound")
    val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("item")).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("approxTopK survives adversarial partitioning (hot items clustered)") {
    import spark.implicits._
    // all copies of each hot item land in ONE partition (repartition by
    // item): the pigeonhole containment must still hold per partition
    val rows = (1 to 30).flatMap(j => Seq.fill(2000 / j)(s"w$j"))
    val df = rows.toDF("item").repartition(8, col("item"))
    val got = HeavyHitters.approxTopK(spark, df, "item", k = 5, m = 64)
      .collect()
    assert(got.forall(_.getBoolean(2)))
    val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("item")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("approxTopKAdaptive widens until certified where fixed width fails") {
    import spark.implicits._
    // flat-ish mass: 1500 items × 40 copies (N = 60000). k-th cnt = 40;
    // at m0=16, 40·16 = 640 < 60000 — uncertified; the doubling reaches
    // m=2048 (40·2048 > 60000) and the answer must then BE the exact
    // top-k.
    val rows = (1 to 1500).flatMap(j => Seq.fill(40)(f"w$j%04d"))
    val df = rows.toDF("item").repartition(8)
    val fixed = HeavyHitters.approxTopK(spark, df, "item", k = 10, m = 16)
    assert(fixed.collect().forall(!_.getBoolean(2)),
      "fixed m=16 must not certify this frame")
    val got = HeavyHitters
      .approxTopKAdaptive(spark, df, "item", k = 10, m0 = 16).collect()
    assert(got.forall(_.getBoolean(2)), "adaptive width must certify")
    val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("item")).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
    // maxM caps the loop: an uncertifiable frame surfaces guaranteed =
    // false instead of spinning (5000 singletons, cap at 64) — and the
    // ROWS must still be the exact top-k (round-7 advice: the old path
    // returned the last sketch's partitioning-dependent candidates, so
    // the declared query could drift from its exact-GROUP-BY oracle on
    // exactly the corpora where certification fails)
    val uni = (1 to 5000).map(i => s"u$i").toDF("item").repartition(8)
    val capped = HeavyHitters
      .approxTopKAdaptive(spark, uni, "item", k = 5, m0 = 32, maxM = 64)
      .collect()
    assert(capped.forall(!_.getBoolean(2)))
    val exactUni = uni.groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("item")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(capped.map(r => (r.getString(0), r.getLong(1))).toSeq == exactUni,
      "uncertified fallback must return the exact top-k rows")
  }

  test("approxTopK withdraws its guarantee on a uniform frame") {
    import spark.implicits._
    // 5000 distinct items once each: k-th cnt = 1, 1 * 64 <= 5000
    val df = (1 to 5000).map(i => s"u$i").toDF("item").repartition(8)
    val got = HeavyHitters.approxTopK(spark, df, "item", k = 5, m = 64)
    assert(got.collect().forall(!_.getBoolean(2)))
  }

  test("ks test: exactly matches a driver-side ECDF supremum at sf0.001") {
    import spark.implicits._
    val ev = graft.core.Tables.read(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val byType = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sorted }
    val types = byType.keys.toSeq.sorted
    val expected = for {
      ta <- types; tb <- types if ta < tb
    } yield {
      val (xa, xb) = (byType(ta), byType(tb))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val points = (xa ++ xb).distinct
      val dmax = points.map { v =>
        val ca = xa.count(_ <= v).toDouble / na
        val cb = xb.count(_ <= v).toDouble / nb
        math.abs(ca - cb)
      }.max
      val ks = math.sqrt(na.toDouble * nb.toDouble /
        (na.toDouble + nb.toDouble)) * dmax
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (ta, tb, na, nb, r6(dmax), r6(ks))
    }
    val got = SparkEntry.queries("profile_ks_test")(spark, sf)
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    // D and n are exact; ks may differ in the last ulp because the driver
    // recomputation does not replicate the engine's exact double tree for
    // dmax intermediates — compare at the rounded-6dp level the oracle
    // gates, minus that tolerance on ks only
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ===
      expected.map(r => (r._1, r._2, r._3, r._4)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-9, s"d_stat ${g._1}/${g._2}")
      assert(math.abs(g._6 - e._6) < 1e-9, s"ks_stat ${g._1}/${g._2}")
    }
  }

  test("cross-correlation: exactly matches a driver-side recomputation " +
    "at sf0.001") {
    import spark.implicits._
    val ev = graft.core.Tables.read(spark, sf, "events")
      .select(unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, String)].collect()
    def counts(t: String): Map[Long, Long] = ev.filter(_._2 == t)
      .groupBy(r => Math.floorDiv(r._1, 3600000000L))
      .map { case (h, xs) => h -> xs.size.toLong }
    val xv = counts("view"); val yv = counts("purchase")
    val hs = (xv.keySet ++ yv.keySet)
    val (h0, h1) = (hs.min, hs.max)
    val expected = (-3L to 3L).map { lag =>
      // hours t where both t and t+lag are on the grid
      val ts = (h0 to h1).filter(t => t + lag >= h0 && t + lag <= h1)
      val n = ts.size.toLong
      val xs = ts.map(t => xv.getOrElse(t, 0L))
      val ys = ts.map(t => yv.getOrElse(t + lag, 0L))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)
      val r = if (den > 0)
        Some(BigDecimal(num / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      (lag, n, r)
    }
    val got = SparkEntry.queries("ts_cross_correlation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === expected)
  }
}
