package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Product-analytics operators over the events stream: ordered funnel
  * conversion and weekly cohort retention — the two queries every
  * behavioral warehouse runs daily. Both are expressed as co-partitioned
  * aggregations on `user_id` (the natural 100 TB shuffle key: one hash
  * exchange per stage, reused across stages because every groupBy/join in
  * the plan keys on the same column).
  */
object BehaviorQueries {

  val all: Seq[QueryDef] = Seq(

    // Ordered funnel: view -> click (within 7 days of the first view) ->
    // purchase (within 7 days of the qualifying click). Step N's entry
    // time is the user's EARLIEST step-N event at-or-after their step-N-1
    // entry — the standard "ordered funnel with conversion window"
    // semantics. Each step is one filter + groupBy(user_id) + min(ts);
    // the step-to-step joins are on user_id, co-partitioned with the
    // aggregations, so the whole funnel is one exchange per step over
    // ONLY that step's event type (the filters push to the scan).
    QueryDef("events_funnel",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .select("user_id", "event_type", "ts")
        val step1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val step2 = ev.filter(col("event_type") === "click")
          .join(step1, "user_id")
          .filter(col("ts") >= col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val step3 = ev.filter(col("event_type") === "purchase")
          .join(step2, "user_id")
          .filter(col("ts") >= col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        val counts = step1.agg(count(lit(1)).as("n1"))
          .crossJoin(step2.agg(count(lit(1)).as("n2")))
          .crossJoin(step3.agg(count(lit(1)).as("n3")))
        counts.select(explode(array(
            struct(lit(1L).as("step"), lit("view").as("event_type"),
              col("n1").as("n_users"),
              lit(1000000L).as("conv_ppm")),
            struct(lit(2L).as("step"), lit("click").as("event_type"),
              col("n2").as("n_users"),
              expr("(n2 * 1000000) div n1").as("conv_ppm")),
            struct(lit(3L).as("step"), lit("purchase").as("event_type"),
              col("n3").as("n_users"),
              expr("(n3 * 1000000) div n1").as("conv_ppm")))).as("r"))
          .select("r.step", "r.event_type", "r.n_users", "r.conv_ppm")
          .orderBy("step")
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |            WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |       JOIN s1 USING (user_id)
             |       WHERE e.event_type = 'click' AND e.ts >= s1.t1
             |         AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |       JOIN s2 USING (user_id)
             |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
             |         AND e.ts <= s2.t2 + INTERVAL 7 DAY GROUP BY 1),
             |n AS (SELECT (SELECT count(*) FROM s1) AS n1,
             |             (SELECT count(*) FROM s2) AS n2,
             |             (SELECT count(*) FROM s3) AS n3)
             |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
             |  n1 AS n_users, CAST(1000000 AS BIGINT) AS conv_ppm FROM n
             |UNION ALL
             |SELECT 2, 'click', n2, n2 * 1000000 // n1 FROM n
             |UNION ALL
             |SELECT 3, 'purchase', n3, n3 * 1000000 // n1 FROM n
             |ORDER BY step""".stripMargin)),

    // Weekly cohort retention: users grouped by the Monday-truncated week
    // of their FIRST event; a cell (cohort_week, week_offset) counts the
    // cohort's users active in that later week. Two aggregations, both
    // keyed on user_id until the final small rollup — the cohort join is
    // co-partitioned with the first groupBy, and the (cohort, offset)
    // rollup's distinct is bounded by |users| × |weeks|, tiny relative to
    // the event count it reduces from.
    QueryDef("events_retention",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events").select("user_id", "ts")
        val cohort = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date")
            .as("cohort_week"))
        ev.join(cohort, "user_id")
          .select(col("cohort_week"), col("user_id"),
            expr("datediff(CAST(ts AS DATE), cohort_week) div 7")
              .cast("long").as("week_offset"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH cohort AS (
             |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
             |    AS cohort_week
             |  FROM events GROUP BY 1),
             |act AS (SELECT DISTINCT c.cohort_week, e.user_id,
             |  CAST(date_diff('day', c.cohort_week, CAST(e.ts AS DATE)) // 7
             |       AS BIGINT) AS week_offset
             |  FROM events e JOIN cohort c USING (user_id))
             |SELECT cohort_week, week_offset, count(*) AS n_users
             |FROM act GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)),

    // Event-sequence pattern matching (the MATCH_RECOGNIZE shape): each
    // user's event history becomes an ordered initial-letter string; a
    // regex counts non-overlapping view→click→purchase runs. One
    // groupBy(user_id) whose state is bounded by events-per-user (the
    // sort is per-group, not global); a user with unbounded history
    // would move to the flatMapGroupsWithState streaming form — same
    // pattern automaton, bounded state. Deterministic ordering via the
    // (ts, event_id) tie-break both engines share.
    QueryDef("events_sequence_pattern",
      (s, dir) => {
        val seqs = Tables.read(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .groupBy("user_id")
          .agg(concat_ws("",
            transform(
              array_sort(collect_list(struct(col("us").as("us"),
                col("event_id").as("eid"),
                substring(col("event_type"), 1, 1).as("c")))),
              x => x.getField("c"))).as("s"))
        seqs.select(col("user_id"),
            length(col("s")).cast("long").as("seq_len"),
            regexp_count(col("s"), lit("vcp")).cast("long").as("n_patterns"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  CAST(length(s) AS BIGINT) AS seq_len,
             |  CAST(len(regexp_extract_all(s, 'vcp')) AS BIGINT) AS n_patterns
             |FROM (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |               ORDER BY ts, event_id) AS s
             |  FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // Event-transition Markov matrix: per-user ordered lead() pairs the
    // consecutive event types (one window pass — the only wide op over
    // the events table), then the 5×5 transition counts; probabilities
    // in fixed-point ppm over a 25-row window so the second "pass" costs
    // nothing. The product-analytics "where do users go next" primitive.
    QueryDef("events_markov",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tr = Tables.read(s, dir, "events")
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        tr.withColumn("n_from", sum("n").over(
            org.apache.spark.sql.expressions.Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 1000000 div n_from").as("p_ppm"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS from_type, lead(event_type) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT from_type, to_type, count(*) AS n
             |      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type)
             |       AS BIGINT) AS p_ppm
             |FROM c ORDER BY from_type, to_type""".stripMargin)),

    // Last-touch attribution: each purchase credits the user's most
    // recent preceding non-purchase event (IGNORE NULLS last_value over
    // the preceding frame — one window pass, the only events-wide op);
    // purchases with no prior touch credit 'none'. Shares in fixed-point
    // ppm over the tiny per-touch rollup.
    QueryDef("events_attribution",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val att = Tables.read(s, dir, "events")
          .withColumn("touch", last(
            when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
          .agg(count(lit(1)).as("n_purchases"))
        att.withColumn("share_ppm", expr(
            "n_purchases * 1000000 div sum(n_purchases) over ()"))
          .orderBy("touch_type")
      },
      Some("""WITH att AS (
             |  SELECT event_type, last_value(
             |      CASE WHEN event_type <> 'purchase' THEN event_type END
             |      IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
             |  FROM events),
             |c AS (SELECT coalesce(touch, 'none') AS touch_type,
             |        count(*) AS n_purchases
             |      FROM att WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT touch_type, n_purchases,
             |  CAST(n_purchases * 1000000 // sum(n_purchases) OVER ()
             |       AS BIGINT) AS share_ppm
             |FROM c ORDER BY touch_type""".stripMargin)),

    // DAU / rolling-7-day WAU / stickiness — THE product engagement
    // metric. The (day, user) distinct frame is the only data-sized agg;
    // WAU expands each active day over the 7 days it contributes to
    // (map-side ×7 explode of the DISTINCT frame, not the raw events)
    // before the second distinct. Stickiness in fixed-point ppm.
    QueryDef("events_dau_wau",
      (s, dir) => {
        val du = Tables.read(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
          .localCheckpoint() // reused by both metrics
        val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = du
          .select(col("user_id"), explode(expr(
            "sequence(day, date_add(day, 6))")).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("wau"))
        dau.join(wau, "day")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            expr("dau * 1000000 div wau").as("stickiness_ppm"))
          .orderBy("day")
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
             |expand AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER)
             |    AS day
             |  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS i)),
             |wau AS (SELECT day, count(*) AS wau FROM expand GROUP BY 1)
             |SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau,
             |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
             |FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // Inter-arrival time statistics per event type: per-user consecutive
    // gaps in integer microseconds (one window pass), then exact
    // median/p90 over the integer gaps (percentile ≡ quantile_cont,
    // proven by agg_percentile) and an integer mean. The traffic-model
    // primitive behind capacity planning and bot detection.
    QueryDef("events_inter_arrival",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.read(s, dir, "events")
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .filter(col("gap_us").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            expr("sum(gap_us) div count(gap_us)").as("mean_us"),
            round(expr("percentile(gap_us, 0.5)"), 6).as("p50_us"),
            round(expr("percentile(gap_us, 0.9)"), 6).as("p90_us"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events)
             |SELECT event_type, count(*) AS n_gaps,
             |  CAST(CAST(sum(gap_us) AS BIGINT) // count(gap_us) AS BIGINT)
             |    AS mean_us,
             |  round(quantile_cont(gap_us, 0.5), 6) AS p50_us,
             |  round(quantile_cont(gap_us, 0.9), 6) AS p90_us
             |FROM g WHERE gap_us IS NOT NULL
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Two-proportion z-test (A/B testing): users split by id parity,
    // conversion = any purchase event. Counts are exact integers off one
    // distinct-user agg; the pooled z statistic runs the identical double
    // formula in both engines. The experiment-readout primitive.
    QueryDef("events_ab_test",
      (s, dir) => {
        val users = Tables.read(s, dir, "events")
          .groupBy(pmod(col("user_id"), lit(2)).as("cohort"), col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        val g = users.groupBy("cohort")
          .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        val wide = g.groupBy()
          .agg(max(when(col("cohort") === 0, col("n_users"))).as("na"),
            max(when(col("cohort") === 0, col("n_conv"))).as("ca"),
            max(when(col("cohort") === 1, col("n_users"))).as("nb"),
            max(when(col("cohort") === 1, col("n_conv"))).as("cb"))
        wide.select(col("na"), col("ca"), col("nb"), col("cb"),
          round(d(col("ca")) / d(col("na")), 6).as("rate_a"),
          round(d(col("cb")) / d(col("nb")), 6).as("rate_b"),
          round((d(col("ca")) / d(col("na")) - d(col("cb")) / d(col("nb")))
            / sqrt((d(col("ca")) + d(col("cb"))) / (d(col("na")) + d(col("nb")))
              * (lit(1.0) - (d(col("ca")) + d(col("cb")))
                / (d(col("na")) + d(col("nb"))))
              * (lit(1.0) / d(col("na")) + lit(1.0) / d(col("nb")))), 6)
            .as("z_score"))
      },
      Some("""WITH u AS (SELECT user_id % 2 AS cohort, user_id,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |        END) AS BIGINT) AS converted
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT cohort, count(*) AS n_users,
             |    CAST(sum(converted) AS BIGINT) AS n_conv
             |  FROM u GROUP BY 1),
             |w AS (SELECT
             |    max(CASE WHEN cohort = 0 THEN n_users END) AS na,
             |    max(CASE WHEN cohort = 0 THEN n_conv END) AS ca,
             |    max(CASE WHEN cohort = 1 THEN n_users END) AS nb,
             |    max(CASE WHEN cohort = 1 THEN n_conv END) AS cb
             |  FROM g)
             |SELECT na, ca, nb, cb,
             |  round(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE), 6) AS rate_a,
             |  round(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS rate_b,
             |  round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
             |         - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             |    / sqrt((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
             |        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
             |      * (1.0 - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
             |          / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
             |      * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))),
             |    6) AS z_score
             |FROM w""".stripMargin)),

    // Peak concurrency per hour by SWEEP LINE: each event opens an
    // interval [ts, ts + max(1, ⌊value⌋) seconds); interval starts emit
    // +1 boundaries and (half-open) ends emit −1, and the running sum of
    // boundaries in (t, d) order IS the number of live intervals — see
    // ops/Sweep.scala for the distributed two-phase prefix-sum plan.
    QueryDef("events_concurrency",
      (s, dir) => graft.ops.Sweep.hourlyConcurrency(
        Tables.read(s, dir, "events")),
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) AS st,
             |    epoch_us(ts)
             |      + greatest(1, CAST(floor(value) AS BIGINT)) * 1000000 AS en
             |  FROM events),
             |b AS (
             |  SELECT st AS t, CAST(1 AS BIGINT) AS d FROM ev
             |  UNION ALL
             |  SELECT en AS t, CAST(-1 AS BIGINT) AS d FROM ev),
             |r AS (SELECT t, d, t // 3600000000 AS bucket,
             |        CAST(sum(d) OVER (ORDER BY t, d) AS BIGINT) AS run
             |      FROM b),
             |c AS (SELECT bucket, CAST(sum(d) AS BIGINT) AS ds,
             |        count(*) AS nb FROM r GROUP BY 1),
             |o AS (SELECT bucket, nb,
             |        CAST(sum(ds) OVER (ORDER BY bucket) - ds AS BIGINT)
             |          AS carry
             |      FROM c)
             |SELECT make_timestamp(r.bucket * 3600000000) AS hour_start,
             |  greatest(max(r.run), max(o.carry)) AS peak,
             |  max(o.nb) AS n_boundaries
             |FROM r JOIN o ON r.bucket = o.bucket
             |GROUP BY 1 ORDER BY hour_start""".stripMargin)),

    // Cohort LTV matrix: users grouped by first-seen week (cohort), purchase
    // revenue rolled up by weeks-since-first-seen (age) — the
    // lifetime-value view that retention (count-based) can't show. Both
    // week indexes derive from exact integer day arithmetic against
    // broadcast 1-row anchors; revenue decimal-sums before its one double
    // cast. Frame is a weeks×weeks DOMAIN grid; the heavy lifting is two
    // user-keyed aggregations sharing the user_id exchange.
    QueryDef("events_cohort_ltv",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .select("user_id", "ts", "event_type", "value")
        val first = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("d0"))
        val g0 = ev.agg(min(to_date(col("ts"))).as("g0"))
        val rev = ev
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
        rev.join(first, "user_id").crossJoin(broadcast(g0))
          .select(
            expr("CAST(datediff(d0, g0) div 7 AS BIGINT)").as("cohort_week"),
            expr("CAST(datediff(day, d0) div 7 AS BIGINT)").as("age_week"),
            col("user_id"), col("value"))
          .groupBy("cohort_week", "age_week")
          .agg(countDistinct("user_id").as("n_buyers"),
            count(lit(1)).as("n_purchases"),
            round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
              .as("revenue"))
          .orderBy("cohort_week", "age_week")
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
             |  FROM events GROUP BY 1),
             |g0 AS (SELECT min(CAST(ts AS DATE)) AS g0 FROM events),
             |rev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
             |  FROM events
             |  WHERE event_type = 'purchase' AND value IS NOT NULL),
             |j AS (SELECT
             |    CAST(date_diff('day', g0.g0, f.d0) // 7 AS BIGINT)
             |      AS cohort_week,
             |    CAST(date_diff('day', f.d0, r.day) // 7 AS BIGINT)
             |      AS age_week,
             |    r.user_id, r.value
             |  FROM rev r JOIN f USING (user_id) CROSS JOIN g0)
             |SELECT cohort_week, age_week,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
             |  count(*) AS n_purchases,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
             |    AS revenue
             |FROM j GROUP BY 1, 2
             |ORDER BY cohort_week, age_week""".stripMargin))
  )
}
