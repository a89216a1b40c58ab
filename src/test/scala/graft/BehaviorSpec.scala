package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Structural invariants of the round-4 operators (funnel, retention,
  * fuzzy join, incremental dedup, duplicated spans). The oracle pins the
  * exact values; these pin the semantics on hand-built frames.
  */
class BehaviorSpec extends SparkSpec {

  test("funnel: step counts are monotonically non-increasing") {
    import spark.implicits._
    val rows = SparkEntry.queries("events_funnel")(spark, sf)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(rows.size == 3)
    assert(rows(1L) >= rows(2L) && rows(2L) >= rows(3L))
  }

  test("funnel: a purchase BEFORE the first view does not convert") {
    import spark.implicits._
    // user 1: purchase precedes the view -> reaches step 1 only;
    // user 2: view -> click -> purchase in order -> reaches step 3;
    // user 3: view -> click 8 days later -> outside the 7-day window
    val ev = Seq(
      (1L, "purchase", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-02 00:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-02 00:00:00"),
      (2L, "purchase", "2024-01-03 00:00:00"),
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-09 00:00:01")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    // reuse the declared query's logic by writing a temp dir? simpler:
    // inline the same three-stage shape the query declares
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    assert(s1.count() == 3 && s2.count() == 1 && s3.count() == 1)
    assert(s3.select("user_id").as[Long].collect().toSet == Set(2L))
  }

  test("retention: every cohort has a week-0 cell counting all its users") {
    import spark.implicits._
    val r = SparkEntry.queries("events_retention")(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect()
    val byCohort = r.groupBy(_._1)
    // week 0 exists for every cohort and is its max cell (first week
    // contains every user's first event by construction)
    byCohort.foreach { case (_, cells) =>
      val w0 = cells.find(_._2 == 0L)
      assert(w0.nonEmpty, "missing week-0 cell")
      assert(cells.forall(_._3 <= w0.get._3), "week 0 must be the max")
    }
  }

  test("fuzzy join: every probe recovers its own source row at distance 1") {
    import spark.implicits._
    val matched = SparkEntry.queries("join_fuzzy")(spark, sf)
      .filter(col("probe_id") === col("c_custkey"))
      .select("probe_id").as[Long].collect().toSet
    val probes = graft.core.Tables.read(spark, sf, "customer")
      .filter(pmod(col("c_custkey"), lit(19)) === 0)
      .select("c_custkey").as[Long].collect().toSet
    assert(probes.nonEmpty && matched == probes,
      "the perturbed name must match its source within the block")
  }

  test("incremental dedup: copies flag, originals don't, short docs survive") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, text), // corpus
      (2L, "one two three four five six seven eight nine ten"), // corpus
      (10L, text), // new, exact copy of corpus doc 1 -> dup
      (20L, "totally different words nobody else wrote here today ok"),
      (30L, "x") // new, too short to shingle -> present, not dup
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalFlags(docs, pmod(col("doc_id"), lit(10)) === 0)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> true, 20L -> false, 30L -> false))
  }

  test("dup spans: identical docs are 100% duplicated, unique docs 0%") {
    import spark.implicits._
    val eight = "a b c d e f g h i j"
    val docs = Seq(
      (1L, eight), (2L, eight),
      (3L, "p q r s t u v w x y")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpans(docs)
      .select("doc_id", "dup_ppm").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 0L))
  }

  test("concurrency: hand-built intervals, carry-in peak across the hour " +
    "boundary") {
    import spark.implicits._
    // Three intervals open in hour 0 and stay open into hour 1 (durations
    // 3600/3700/3800 s from 00:10); hour 1 has only −1 boundaries, so its
    // peak (3) is PURE CARRY-IN. A fourth interval [00:20, 00:20+60s)
    // nests inside: peak in hour 0 is 4. At 02:00:00 two intervals start
    // at the SAME microsecond: hour 2 peak 2.
    val ev = Seq(
      ("2024-01-01 00:10:00", 3600.0),
      ("2024-01-01 00:10:00", 3700.0),
      ("2024-01-01 00:10:00", 3800.0),
      ("2024-01-01 00:20:00", 60.0),
      ("2024-01-01 02:00:00", 120.0),
      ("2024-01-01 02:00:00", 120.0)
    ).toDF("ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = graft.ops.Sweep.hourlyConcurrency(ev)
      .select("hour_start", "peak", "n_boundaries")
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map { case (h, p, n) => ((h.getTime / 3600000L) % 24, p, n) }
    assert(out.toSeq === Seq(
      (0L, 4L, 5L), // 3 long opens + short open/close
      (1L, 3L, 3L), // only closes; peak is the carried-in 3
      (2L, 2L, 4L)))
  }

  test("concurrency: pre-1970 timestamps floor into the correct hour " +
    "bucket") {
    import spark.implicits._
    // 23:30 UTC on 1969-12-31 is NEGATIVE micros; truncating division
    // would bucket it at hour 0 alongside the 00:30 interval — flooring
    // keeps them one hour apart
    val ev = Seq(
      ("1969-12-31 23:30:00", 60.0),
      ("1970-01-01 00:30:00", 60.0)
    ).toDF("ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = graft.ops.Sweep.hourlyConcurrency(ev)
      .select("hour_start", "peak")
      .as[(java.sql.Timestamp, Long)].collect()
      .map { case (h, p) => (h.getTime / 3600000L, p) }
    assert(out.toSeq === Seq((-1L, 1L), (0L, 1L)))
  }

  test("concurrency: two-phase prefix sum equals a driver-side sweep at " +
    "sf0.001") {
    import spark.implicits._
    val events = graft.core.Tables.read(spark, sf, "events")
    val rows = events
      .select(unix_micros(col("ts")).as("st"), col("value"))
      .as[(Long, Double)].collect()
    val bounds = rows.flatMap { case (st, v) =>
      val en = st + math.max(1L, math.floor(v).toLong) * 1000000L
      Seq((st, 1L), (en, -1L))
    }.sortBy(identity)
    var run = 0L
    val peak = scala.collection.mutable.LinkedHashMap[Long, Long]()
    val nb = scala.collection.mutable.Map[Long, Long]()
    bounds.foreach { case (t, d) =>
      val b = Math.floorDiv(t, 3600000000L)
      if (!peak.contains(b)) peak(b) = run // carry-in
      run += d
      peak(b) = math.max(peak(b), run)
      nb(b) = nb.getOrElse(b, 0L) + 1
    }
    val expected = peak.toSeq.sortBy(_._1)
      .map { case (b, p) => (b * 3600000000L, p, nb(b)) }
    val got = graft.ops.Sweep.hourlyConcurrency(events)
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map { case (h, p, n) => (h.getTime * 1000L, p, n) }.toSeq
    assert(got === expected)
  }
}
