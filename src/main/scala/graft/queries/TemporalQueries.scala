package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Temporal join operators Spark lacks as built-ins (SURVEY §2.3 "not
  * present" row): as-of join and range (interval) join. The as-of is
  * implemented as the scalable union+running-window composition — one
  * shuffle on the key, no join explosion — and oracled against DuckDB's
  * native ASOF JOIN.
  */
object TemporalQueries {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val all: Seq[QueryDef] = Seq(

    // As-of: for every click, the latest purchase at-or-before it, per
    // user. Range-framed running max over the event-time axis == greatest
    // p.ts <= c.ts (ties included), exactly ASOF LEFT JOIN semantics.
    QueryDef("join_asof",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("us", unix_micros(col("ts")))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(Window.unboundedPreceding, 0)
        ev.withColumn("last_purchase_us",
            max(when(col("event_type") === "purchase", col("us"))).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), tsFmt).as("click_ts"),
            date_format(timestamp_micros(col("last_purchase_us")), tsFmt)
              .as("last_purchase"))
          .orderBy("event_id")
      },
      Some(s"""WITH clicks AS (SELECT event_id, user_id, ts FROM events
              |               WHERE event_type = 'click'),
              |purchases AS (SELECT user_id, ts FROM events
              |              WHERE event_type = 'purchase')
              |SELECT c.event_id, c.user_id,
              |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
              |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase
              |FROM clicks c ASOF LEFT JOIN purchases p
              |  ON c.user_id = p.user_id AND p.ts <= c.ts
              |ORDER BY c.event_id""".stripMargin)),

    // As-of with a MAX-GAP TOLERANCE (pandas merge_asof(tolerance=...)
    // parity): a match older than 10 minutes is dropped back to NULL.
    // Same single window pass as join_asof — the tolerance is a residual
    // predicate on the matched time, zero extra shuffles.
    QueryDef("join_asof_tolerance",
      (s, dir) => {
        val tolUs = 600000000L // 10 min
        val ev = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("us", unix_micros(col("ts")))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(Window.unboundedPreceding, 0)
        ev.withColumn("last_purchase_us",
            max(when(col("event_type") === "purchase", col("us"))).over(w))
          .filter(col("event_type") === "click")
          .withColumn("within_tol",
            col("last_purchase_us") >= col("us") - tolUs)
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), tsFmt).as("click_ts"),
            date_format(timestamp_micros(
              when(col("within_tol"), col("last_purchase_us"))), tsFmt)
              .as("last_purchase"))
          .orderBy("event_id")
      },
      Some(s"""WITH clicks AS (SELECT event_id, user_id, ts FROM events
              |               WHERE event_type = 'click'),
              |purchases AS (SELECT user_id, ts FROM events
              |              WHERE event_type = 'purchase')
              |SELECT c.event_id, c.user_id,
              |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
              |  CASE WHEN p.ts >= c.ts - INTERVAL 10 MINUTE
              |       THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') END
              |    AS last_purchase
              |FROM clicks c ASOF LEFT JOIN purchases p
              |  ON c.user_id = p.user_id AND p.ts <= c.ts
              |ORDER BY c.event_id""".stripMargin)),

    // FORWARD as-of: for every click, the EARLIEST purchase at-or-after
    // it (the "time-to-next-conversion" direction). Mirror of join_asof:
    // a range-framed running MIN over the FOLLOWING frame — still one
    // shuffle on the user key; DuckDB's ASOF supports only the backward
    // direction, so the oracle flips the time axis (negated epoch) to
    // express forward matching as a backward ASOF.
    QueryDef("join_asof_forward",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("us", unix_micros(col("ts")))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(0, Window.unboundedFollowing)
        ev.withColumn("next_purchase_us",
            min(when(col("event_type") === "purchase", col("us"))).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), tsFmt).as("click_ts"),
            date_format(timestamp_micros(col("next_purchase_us")), tsFmt)
              .as("next_purchase"))
          .orderBy("event_id")
      },
      Some(s"""WITH clicks AS (SELECT event_id, user_id, ts,
              |    -epoch_us(ts) AS nts FROM events
              |  WHERE event_type = 'click'),
              |purchases AS (SELECT user_id, ts, -epoch_us(ts) AS nts
              |  FROM events WHERE event_type = 'purchase')
              |SELECT c.event_id, c.user_id,
              |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
              |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase
              |FROM clicks c ASOF LEFT JOIN purchases p
              |  ON c.user_id = p.user_id AND p.nts <= c.nts
              |ORDER BY c.event_id""".stripMargin)),

    // The same ASOF LEFT JOIN through the engine's whole-operator Catalyst
    // extension (plans/AsOfJoin.scala: custom LogicalPlan -> Strategy ->
    // SparkPlan): co-partitioned sort-merge with an O(1) carry, able to
    // attach arbitrary right payload columns. Same DuckDB oracle as
    // `join_asof` — the two implementations must agree bit-for-bit.
    QueryDef("join_asof_native",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"),
            unix_micros(col("ts")).as("us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        graft.plans.AsOf.asofJoin(clicks, purchases,
            key = "user_id", leftTime = "us", rightTime = "us",
            payload = Seq("us"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), tsFmt).as("click_ts"),
            date_format(timestamp_micros(col("us__r")), tsFmt)
              .as("last_purchase"))
          .orderBy("event_id")
      },
      Some(s"""WITH clicks AS (SELECT event_id, user_id, ts FROM events
              |               WHERE event_type = 'click'),
              |purchases AS (SELECT user_id, ts FROM events
              |              WHERE event_type = 'purchase')
              |SELECT c.event_id, c.user_id,
              |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
              |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase
              |FROM clicks c ASOF LEFT JOIN purchases p
              |  ON c.user_id = p.user_id AND p.ts <= c.ts
              |ORDER BY c.event_id""".stripMargin)),

    // Range join: band assignment by value interval — small interval table
    // broadcast, nested-loop on the range predicate.
    QueryDef("join_range",
      (s, dir) => {
        val bands = s.range(0, 10).select(
          col("id").as("band_id"),
          (col("id") * 50.0d).as("lo"),
          ((col("id") + 1) * 50.0d).as("hi"))
        Tables.read(s, dir, "events")
          .join(broadcast(bands),
            col("value") >= col("lo") && col("value") < col("hi"))
          .select(col("event_id"), col("band_id"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, b.band_id FROM events e
             |JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
             |      FROM generate_series(0, 9) t(i)) b
             |  ON e.value >= b.lo AND e.value < b.hi
             |ORDER BY e.event_id""".stripMargin)),

    // The same range join, AUTO-binned by the Catalyst optimizer rule
    // (plans/RangeBinJoin, installed session-wide but inert without its
    // hint): the user writes the PLAIN declarative range join, sets only
    // the bin-size hint, and the rule rewrites the nested-loop into the
    // bin-bucketed equi join that join_range_binned builds by hand —
    // production range-join support as a plan rewrite, not a query
    // rewrite. The hint is scoped: set → eagerly optimized+materialized
    // (localCheckpoint) → unset, so no other query's plan is touched.
    // Same oracle as join_range: the rewrite must be result-identical
    // (RangeBinJoinSpec additionally pins the plan shape and the
    // equi-key extraction).
    QueryDef("join_range_auto",
      (s, dir) => {
        s.conf.set(graft.plans.RangeBinJoin.BinSizeKey, "32")
        try {
          val bands = s.range(0, 10).select(
            col("id").as("band_id"),
            (col("id") * 50.0d).as("lo"),
            ((col("id") + 1) * 50.0d).as("hi"))
          Tables.read(s, dir, "events")
            .join(bands,
              col("value") >= col("lo") && col("value") < col("hi"))
            .select(col("event_id"), col("band_id"))
            .localCheckpoint() // optimize NOW, while the hint is in scope
            .orderBy("event_id")
        } finally s.conf.unset(graft.plans.RangeBinJoin.BinSizeKey)
      },
      Some("""SELECT e.event_id, b.band_id FROM events e
             |JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
             |      FROM generate_series(0, 9) t(i)) b
             |  ON e.value >= b.lo AND e.value < b.hi
             |ORDER BY e.event_id""".stripMargin)),

    // The same range join, binned: every interval explodes to the fixed-
    // width bins it overlaps, points key to their bin, and the range
    // predicate becomes an EQUI-join on bin + a residual filter. This is
    // the shape that survives a LARGE interval table — a hash shuffle on
    // bin instead of a broadcast nested loop. Bin width 32 is deliberately
    // unaligned with the 50-wide bands (intervals span 2-3 bins; an
    // over-covered edge bin is eliminated by the residual). Same oracle as
    // `join_range` — the rewrite must be result-identical.
    QueryDef("join_range_binned",
      (s, dir) => {
        val binW = 32.0d
        val bands = s.range(0, 10).select(
          col("id").as("band_id"),
          (col("id") * 50.0d).as("lo"),
          ((col("id") + 1) * 50.0d).as("hi"))
        val binned = bands.withColumn("bin",
          explode(sequence(floor(col("lo") / binW).cast("long"),
            floor(col("hi") / binW).cast("long"))))
        Tables.read(s, dir, "events")
          .withColumn("bin", floor(col("value") / binW).cast("long"))
          .join(binned, "bin")
          .filter(col("value") >= col("lo") && col("value") < col("hi"))
          .select(col("event_id"), col("band_id"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, b.band_id FROM events e
             |JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
             |      FROM generate_series(0, 9) t(i)) b
             |  ON e.value >= b.lo AND e.value < b.hi
             |ORDER BY e.event_id""".stripMargin)),

    // INTERVAL-OVERLAP join — the interval×interval member of the
    // temporal-join family (as-of = point×ordered, range = point×bands;
    // this is the genomics/session-alignment shape): per user, every
    // (view, purchase) interval pair that truly overlaps, with the
    // overlap length. Intervals are half-open [ts, ts + max(1, ⌊value⌋)s)
    // — touching endpoints do NOT overlap (strict <, pinned by spec).
    //
    // Scale: the join is EQUI on user_id — the natural co-partitioning
    // key, one hash exchange per side, overlap as a residual predicate
    // over the per-user candidate pairs (bounded by per-user activity,
    // the same skew class every per-user window in this engine rides).
    // For a KEYLESS interval join at 100 TB, the bucket-blocking variant
    // of ops/Sweep's hour grid applies (explode each interval into its
    // covered buckets, equi-join on bucket, dedup) — keyed overlap never
    // needs it.
    QueryDef("join_interval_overlap",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
        def iv(t: String, idc: String, sc: String, ec: String) =
          ev.filter(col("event_type") === t)
            .select(col("user_id"), col("event_id").as(idc),
              unix_micros(col("ts")).as(sc),
              (unix_micros(col("ts")) +
                greatest(lit(1L), floor(col("value")).cast("long")) *
                  lit(1000000L)).as(ec))
        val v = iv("view", "view_id", "vs", "ve")
        val p = iv("purchase", "purchase_id", "ps", "pe")
        v.join(p, Seq("user_id"))
          .filter(col("vs") < col("pe") && col("ps") < col("ve"))
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            (least(col("ve"), col("pe")) - greatest(col("vs"), col("ps")))
              .as("overlap_us"))
          .orderBy("user_id", "view_id", "purchase_id")
      },
      Some("""WITH iv AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS s,
             |    epoch_us(ts)
             |      + greatest(1, CAST(floor(value) AS BIGINT)) * 1000000
             |      AS e
             |  FROM events WHERE event_type IN ('view', 'purchase'))
             |SELECT v.user_id, v.event_id AS view_id,
             |  p.event_id AS purchase_id,
             |  least(v.e, p.e) - greatest(v.s, p.s) AS overlap_us
             |FROM iv v JOIN iv p
             |  ON v.user_id = p.user_id
             |  AND v.event_type = 'view' AND p.event_type = 'purchase'
             |  AND v.s < p.e AND p.s < v.e
             |ORDER BY v.user_id, view_id, purchase_id""".stripMargin)),

    // NEAREST-in-time as-of: the closest purchase in EITHER direction
    // per click (ties → the earlier/backward match) — the sensor-fusion
    // flavor of as-of both pandas (direction='nearest') and kdb offer.
    // Composed from the backward running-max and forward running-min on
    // ONE user-partitioned window pass each (the join_asof plan: one
    // shuffle on the key, no join explosion); the pick is pure per-row
    // arithmetic on exact microsecond longs.
    QueryDef("join_asof_nearest",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("us", unix_micros(col("ts")))
        val wb = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(Window.unboundedPreceding, 0)
        val wf = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(0, Window.unboundedFollowing)
        ev.withColumn("lp",
            max(when(col("event_type") === "purchase", col("us"))).over(wb))
          .withColumn("np",
            min(when(col("event_type") === "purchase", col("us"))).over(wf))
          .filter(col("event_type") === "click")
          .withColumn("nearest", when(col("lp").isNull, col("np"))
            .when(col("np").isNull, col("lp"))
            .when(col("us") - col("lp") <= col("np") - col("us"), col("lp"))
            .otherwise(col("np")))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), tsFmt).as("click_ts"),
            date_format(timestamp_micros(col("nearest")), tsFmt)
              .as("nearest_purchase"),
            (col("nearest") - col("us")).as("signed_dist_us"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us
             |  FROM events WHERE event_type = 'click'),
             |purchases AS (SELECT user_id, epoch_us(ts) AS pus
             |  FROM events WHERE event_type = 'purchase'),
             |lp AS (SELECT c.event_id, max(p.pus) AS lp FROM clicks c
             |  JOIN purchases p ON p.user_id = c.user_id AND p.pus <= c.us
             |  GROUP BY 1),
             |np AS (SELECT c.event_id, min(p.pus) AS np FROM clicks c
             |  JOIN purchases p ON p.user_id = c.user_id AND p.pus >= c.us
             |  GROUP BY 1)
             |SELECT c.event_id, c.user_id,
             |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
             |  strftime(make_timestamp(CASE
             |      WHEN lp.lp IS NULL THEN np.np
             |      WHEN np.np IS NULL THEN lp.lp
             |      WHEN c.us - lp.lp <= np.np - c.us THEN lp.lp
             |      ELSE np.np END), '%Y-%m-%d %H:%M:%S.%f')
             |    AS nearest_purchase,
             |  CAST(CASE WHEN lp.lp IS NULL THEN np.np
             |      WHEN np.np IS NULL THEN lp.lp
             |      WHEN c.us - lp.lp <= np.np - c.us THEN lp.lp
             |      ELSE np.np END - c.us AS BIGINT) AS signed_dist_us
             |FROM clicks c
             |LEFT JOIN lp ON lp.event_id = c.event_id
             |LEFT JOIN np ON np.event_id = c.event_id
             |ORDER BY c.event_id""".stripMargin))
  )
}
