package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables
import graft.ops.HeavyHitters

/** Data-profiling and time-series operators (round 2, second wave):
  * one-pass column profiling, sketch-gated exact heavy hitters, calendar
  * gap-fill with forward fill, rolling z-score anomaly flagging, and
  * wide→long unpivot. These are the observability/QA steps a production
  * pipeline runs around every large load (the reference logs per-table
  * counts at main.py:60-63 — this is that idea, industrialized).
  */
object ProfilingQueries {

  /** Render a min/max value as a cross-engine-stable string: doubles via
    * DECIMAL(18,2) (fixed scale, no float formatting drift), timestamps via
    * an explicit pattern, everything else via plain cast.
    */
  private def render(c: Column, dt: String): Column = dt match {
    case "double" => c.cast("decimal(18,2)").cast("string")
    case "timestamp" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  private def renderSql(c: String, dt: String): String = dt match {
    case "double" => s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)"
    case "timestamp" => s"strftime($c, '%Y-%m-%d %H:%M:%S')"
    case _ => s"CAST($c AS VARCHAR)"
  }

  private val OrdersCols = Seq(
    "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
    "o_orderstatus" -> "string", "o_totalprice" -> "double",
    "o_orderdate" -> "timestamp", "o_orderpriority" -> "string")

  val all: Seq[QueryDef] = Seq(

    // Functional-dependency discovery over candidate column pairs — the
    // schema-inference profiling step (a→b holds iff no a-value maps to
    // two b-values): per candidate, ONE combinable groupBy on the LHS
    // counting distinct RHS values, then a 1-row census — shuffle ∝
    // distinct LHS values, never rows. Candidates chosen to exercise
    // both verdicts: the key FDs hold, the reverse/low-cardinality ones
    // must not.
    QueryDef("profile_fd",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
        def fd(name: String, a: String, b: String) = o
          .groupBy(col(a).as("lhs"))
          .agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
            (col("n_violating") === 0).as("holds"))
        fd("o_orderkey->o_custkey", "o_orderkey", "o_custkey")
          .unionByName(fd("o_custkey->o_orderstatus",
            "o_custkey", "o_orderstatus"))
          .unionByName(fd("o_orderpriority->o_orderstatus",
            "o_orderpriority", "o_orderstatus"))
          .unionByName(fd("o_orderkey->o_totalprice",
            "o_orderkey", "o_totalprice"))
          .orderBy("fd")
      },
      Some("""WITH c AS (
             |  SELECT 'o_orderkey->o_custkey' AS fd,
             |    CAST(o_orderkey AS VARCHAR) AS lhs,
             |    CAST(o_custkey AS VARCHAR) AS rhs FROM orders
             |  UNION ALL SELECT 'o_custkey->o_orderstatus',
             |    CAST(o_custkey AS VARCHAR), o_orderstatus FROM orders
             |  UNION ALL SELECT 'o_orderpriority->o_orderstatus',
             |    o_orderpriority, o_orderstatus FROM orders
             |  UNION ALL SELECT 'o_orderkey->o_totalprice',
             |    CAST(o_orderkey AS VARCHAR),
             |    CAST(o_totalprice AS VARCHAR) FROM orders),
             |g AS (SELECT fd, lhs, count(DISTINCT rhs) AS nb
             |  FROM c GROUP BY 1, 2)
             |SELECT fd, count(*) AS n_lhs,
             |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_violating,
             |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
             |    AS holds
             |FROM g GROUP BY 1 ORDER BY fd""".stripMargin)),

    // Referential-integrity census over the star's four FK edges — the
    // first audit a warehouse load runs (orphaned facts mean a broken
    // extract or an out-of-order load; the reference's FK stamping,
    // etl/core/key_mapper.py, silently maps misses to the unknown member
    // — this measures what WOULD have been mapped away). Per edge the
    // child collapses to its DISTINCT key frame first (one combinable
    // groupBy; shuffle ∝ keys, never rows) and anti-joins the parent key
    // set, so a 100 TB fact costs one aggregate plus a key-sized join.
    // NULL FKs count as orphans in both engines (anti-join keeps them;
    // the oracle's LEFT JOIN ... IS NULL does too).
    QueryDef("profile_referential",
      (s, dir) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame,
            fk: String, parent: org.apache.spark.sql.DataFrame,
            pk: String) = {
          val ck = child.groupBy(col(fk).cast("long").as("k"))
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint()
          val orphans = ck.join(
            parent.select(col(pk).cast("long").as("k")).distinct(),
            Seq("k"), "left_anti")
          ck.agg(sum(col("cnt")).as("n_rows"),
              count(lit(1)).as("n_keys"))
            .crossJoin(broadcast(orphans.agg(
              coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"),
              count(lit(1)).as("n_orphan_keys"))))
            .select(lit(name).as("relationship"), col("n_rows"),
              col("n_keys"), col("n_orphan_rows"), col("n_orphan_keys"))
        }
        val li = Tables.read(s, dir, "lineitem")
        edge("lineitem->orders", li, "l_orderkey",
            Tables.read(s, dir, "orders"), "o_orderkey")
          .unionByName(edge("lineitem->part", li, "l_partkey",
            Tables.read(s, dir, "part"), "p_partkey"))
          .unionByName(edge("lineitem->supplier", li, "l_suppkey",
            Tables.read(s, dir, "supplier"), "s_suppkey"))
          .unionByName(edge("orders->customer",
            Tables.read(s, dir, "orders"), "o_custkey",
            Tables.read(s, dir, "customer"), "c_custkey"))
          .orderBy("relationship")
      },
      Some("""WITH e AS (
             |  SELECT 'lineitem->orders' AS relationship,
             |    l_orderkey AS k FROM lineitem
             |  UNION ALL SELECT 'lineitem->part', l_partkey FROM lineitem
             |  UNION ALL SELECT 'lineitem->supplier', l_suppkey FROM lineitem
             |  UNION ALL SELECT 'orders->customer', o_custkey FROM orders),
             |p AS (
             |  SELECT 'lineitem->orders' AS relationship,
             |    o_orderkey AS k FROM orders
             |  UNION ALL SELECT 'lineitem->part', p_partkey FROM part
             |  UNION ALL SELECT 'lineitem->supplier', s_suppkey FROM supplier
             |  UNION ALL SELECT 'orders->customer', c_custkey FROM customer),
             |ck AS (SELECT relationship, k, count(*) AS cnt
             |  FROM e GROUP BY 1, 2),
             |o AS (SELECT ck.relationship,
             |    sum(CASE WHEN p.k IS NULL THEN ck.cnt ELSE 0 END)
             |      AS n_orphan_rows,
             |    sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
             |      AS n_orphan_keys,
             |    sum(ck.cnt) AS n_rows, count(*) AS n_keys
             |  FROM ck LEFT JOIN (SELECT DISTINCT relationship, k FROM p) p
             |    ON p.relationship = ck.relationship AND p.k = ck.k
             |  GROUP BY 1)
             |SELECT relationship, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows,
             |  CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys
             |FROM o ORDER BY relationship""".stripMargin)),

    // One-pass table profiler: every column's null count, exact distinct
    // count, min and max from a SINGLE scan (one wide aggregate; the
    // multiple DISTINCTs plan as one Expand, not N scans), then the 1-row
    // wide result is melted to long form with stack() — driver-side-free.
    // The QA report every ingest of a 100 TB table should print.
    QueryDef("profile_table",
      (s, dir) => {
        // the multi-distinct aggregate plans an Expand (one projection per
        // distinct column) over the scan — ~19× the row volume, all of it
        // on ONE core when the single-file scan arrives as one partition
        // (measured 3.4 s of task time on 1 of 32 cores at sf0.1). Spread
        // first; the gate makes it a no-op on already-wide scans.
        val t = graft.core.Parallelism.spread(
          Tables.read(s, dir, "orders"), col("o_orderkey"))
        val aggs = count(lit(1)).as("n_rows") +: OrdersCols.flatMap {
          case (c, dt) => Seq(
            (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
            countDistinct(col(c)).as(s"${c}__distinct"),
            render(min(col(c)), dt).as(s"${c}__min"),
            render(max(col(c)), dt).as(s"${c}__max"))
        }
        val wide = t.agg(aggs.head, aggs.tail: _*)
        val stackExpr = s"stack(${OrdersCols.size}, " + OrdersCols.map {
          case (c, _) =>
            s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max"
        }.mkString(", ") +
          ") as (col_name, n_nulls, n_distinct, min_repr, max_repr)"
        wide.selectExpr("n_rows", stackExpr)
          .select("col_name", "n_rows", "n_nulls", "n_distinct",
            "min_repr", "max_repr")
          .orderBy("col_name")
      },
      Some(OrdersCols.map { case (c, dt) =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |count(*) - count($c) AS n_nulls,
           |count(DISTINCT $c) AS n_distinct,
           |${renderSql(s"min($c)", dt)} AS min_repr,
           |${renderSql(s"max($c)", dt)} AS max_repr FROM orders""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name"))),

    // Exact heavy hitters by approx-then-verify: per-partition Misra-Gries
    // candidates (state O(k) per task, guaranteed superset of the true
    // heavy hitters), then exact counts of candidates only. Output is
    // EXACTLY {token : count * k > N} — the oracle is the plain
    // GROUP BY ... HAVING the sketch avoids running at full width.
    QueryDef("sketch_heavy_hitters",
      (s, dir) => {
        val toks = graft.ops.TextOps.withTokens(
          Tables.read(s, dir, "documents"))
          .select(explode(col("t")).as("token"))
          .filter(length(col("token")) >= 2)
        HeavyHitters.exact(s, toks, "token", k = 100)
          .withColumnRenamed("item", "token")
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |  FROM documents),
             |f AS (SELECT token FROM toks WHERE length(token) >= 2),
             |tot AS (SELECT count(*) AS n_total FROM f)
             |SELECT token, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
             |FROM f GROUP BY token
             |HAVING count(*) * 100 > (SELECT n_total FROM tot)
             |ORDER BY cnt DESC, token""".stripMargin)),

    // Equal-width histogram of a measure: one tiny min/max agg broadcast
    // back onto the scan (same shape as curation_lang_balance), then one
    // partial+final agg on the bin id — the profiling staple that needs
    // two passes at 100 TB no matter the engine, both map-side-combined.
    // Bin = floor((v-lo)*n/(hi-lo)) clamped so v=hi lands in the last bin;
    // identical double arithmetic in both engines.
    QueryDef("profile_histogram",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
        val bounds = ev.agg(min(col("value")).as("lo"),
          max(col("value")).as("hi"))
        val n = 20
        ev.crossJoin(broadcast(bounds))
          .select(least(
            floor((col("value") - col("lo")) * n / (col("hi") - col("lo"))),
            lit(n - 1)).cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n_rows"))
          .orderBy("bin")
      },
      Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
             |SELECT CAST(least(floor((value - lo) * 20 / (hi - lo)), 19) AS BIGINT) AS bin,
             |count(*) AS n_rows
             |FROM events, b GROUP BY 1 ORDER BY bin""".stripMargin)),

    // Dataset drift between two snapshots (population stability index):
    // orders before/after 1998-01-01 binned on o_totalprice over GLOBAL
    // equal-width bins (one tiny min/max agg broadcast so both sides
    // share boundaries), add-one smoothing so empty bins stay defined,
    // per-bin PSI terms (p_a − p_b)·ln(p_a/p_b) rounded to 6 BEFORE the
    // DECIMAL total so the cross-engine ln ulp can't drift the sum. Two
    // filter-pushed scans + two 10-row aggs — the monitoring job you run
    // against every new training snapshot; PSI > 0.2 = investigate.
    QueryDef("profile_drift",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_totalprice").as("x"),
            (col("o_orderdate") < lit("1998-01-01")).as("is_a"))
        val bounds = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        val n = 10
        val binned = o.crossJoin(broadcast(bounds))
          .select(least(floor((col("x") - col("lo")) * n /
            (col("hi") - col("lo"))), lit(n - 1)).cast("long").as("bin"),
            col("is_a"))
        val counts = binned.groupBy("bin")
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
        val tot = counts.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
        val terms = counts.crossJoin(broadcast(tot))
          .withColumn("p_a",
            (col("n_a") + 1).cast("double") / (col("ta") + n))
          .withColumn("p_b",
            (col("n_b") + 1).cast("double") / (col("tb") + n))
          .withColumn("psi_term",
            round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 6))
        terms
          .withColumn("psi_total",
            sum(col("psi_term").cast("decimal(18,6)")).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(lit(1))).cast("double"))
          .select(col("bin"), col("n_a"), col("n_b"), col("psi_term"),
            col("psi_total"))
          .orderBy("bin")
      },
      Some("""WITH o AS (SELECT o_totalprice AS x,
             |    o_orderdate < TIMESTAMP '1998-01-01' AS is_a FROM orders),
             |b AS (SELECT min(x) AS lo, max(x) AS hi FROM o),
             |binned AS (SELECT
             |    CAST(least(floor((x - lo) * 10 / (hi - lo)), 9) AS BIGINT)
             |      AS bin, is_a FROM o, b),
             |c AS (SELECT bin,
             |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             |  FROM binned GROUP BY 1),
             |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             |             CAST(sum(n_b) AS BIGINT) AS tb FROM c),
             |terms AS (SELECT bin, n_a, n_b,
             |    round((CAST(n_a + 1 AS DOUBLE) / (ta + 10)
             |           - CAST(n_b + 1 AS DOUBLE) / (tb + 10))
             |      * ln((CAST(n_a + 1 AS DOUBLE) / (ta + 10))
             |            / (CAST(n_b + 1 AS DOUBLE) / (tb + 10))), 6)
             |      AS psi_term
             |  FROM c CROSS JOIN t)
             |SELECT bin, n_a, n_b, psi_term,
             |  CAST(sum(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE)
             |    AS psi_total
             |FROM terms ORDER BY bin""".stripMargin)),

    // Catalog census — the information_schema face: one row per managed
    // table with row and column counts (the column count read off the
    // engine's own scan schema, so a catalog/scan drift fails the gate).
    // Ten 1-row count aggs unioned; each is a metadata-cheap scan.
    QueryDef("catalog_census",
      (s, dir) => {
        val tables = Seq("region", "nation", "customer", "supplier",
          "part", "orders", "lineitem", "events", "documents", "embeddings")
        tables.map { t =>
          val df = Tables.read(s, dir, t)
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(t).as("table_name"), col("n_rows"),
              lit(df.columns.length.toLong).as("n_cols"))
        }.reduce(_.unionByName(_)).orderBy("table_name")
      },
      Some {
        val cols = Seq("region" -> 2, "nation" -> 3, "customer" -> 5,
          "supplier" -> 4, "part" -> 6, "orders" -> 6, "lineitem" -> 11,
          "events" -> 6, "documents" -> 5, "embeddings" -> 3)
        cols.map { case (t, nc) =>
          s"""SELECT '$t' AS table_name, count(*) AS n_rows,
             |  CAST($nc AS BIGINT) AS n_cols FROM $t""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
      }),

    // Shannon entropy of the daily event-type mix — the "is today's
    // traffic composition weird" monitor (low entropy = one type
    // dominating). Two key-bounded aggs + a per-day window over ≤5 rows;
    // each −p·ln(p) term rounds to 6 before the DECIMAL total (the
    // profile_drift ln discipline).
    QueryDef("agg_entropy",
      (s, dir) => {
        val c = Tables.read(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("day")
        c.withColumn("tot", sum("n").over(w))
          .withColumn("p", col("n").cast("double") / col("tot"))
          .withColumn("term", round(-col("p") * log(col("p")), 6))
          .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(max(col("tot")).as("n_events"),
            sum(col("term").cast("decimal(18,6)")).cast("double")
              .as("entropy_nats"))
          .orderBy("day")
      },
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type,
             |    count(*) AS n FROM events GROUP BY 1, 2),
             |t AS (SELECT day, event_type, n,
             |    CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS tot
             |  FROM c),
             |terms AS (SELECT day, tot,
             |    round(-(CAST(n AS DOUBLE) / tot)
             |          * ln(CAST(n AS DOUBLE) / tot), 6) AS term
             |  FROM t)
             |SELECT strftime(day, '%Y-%m-%d') AS day,
             |  max(tot) AS n_events,
             |  CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
             |    AS entropy_nats
             |FROM terms GROUP BY 1 ORDER BY day""".stripMargin)),

    // Count-min frequency estimates of the top tokens, probe-verified
    // against exact counts (CMS never under-counts; over-count ≤ eps·N);
    // fixed seed + fixed data ⇒ deterministic verdicts
    QueryDef("sketch_count_min",
      (s, dir) => {
        val toks = graft.ops.TextOps.withTokens(
          Tables.read(s, dir, "documents"))
          .select(explode(col("t")).as("token"))
          .filter(length(col("token")) >= 2)
        graft.ops.Sketches.countMinTopTokens(s, toks, k = 5)
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |  FROM documents),
             |f AS (SELECT token FROM toks WHERE length(token) >= 2),
             |c AS (SELECT token, count(*) AS cnt FROM f GROUP BY token)
             |SELECT token, cnt, TRUE AS within_bound
             |FROM c ORDER BY cnt DESC, token LIMIT 5""".stripMargin)),

    // Approximate top-k (frequent-items sketch face of the heavy hitters):
    // Misra-Gries candidates + exact-count verify, top 20 by count with a
    // `guaranteed` verdict that the k-th count clears the N/m sketch
    // bound. The width is ADAPTIVE (round-7: the sf1 gate caught fixed
    // m=64 silently missing a true top-20 token once the 10× corpus
    // flattened the token mass): m doubles until the certificate holds,
    // at which point the sketch answer IS the exact top-k — so the
    // full-width GROUP BY ... LIMIT stays a fair oracle at every SF, and
    // its verdict is "some width ≤ the cap certifies", i.e.
    // min(top-k cnt)·maxM > N.
    QueryDef("agg_approx_topk",
      (s, dir) => {
        val toks = graft.ops.TextOps.withTokens(
          Tables.read(s, dir, "documents"))
          .select(explode(col("t")).as("token"))
          .filter(length(col("token")) >= 2)
        HeavyHitters.approxTopKAdaptive(s, toks, "token", k = 20, m0 = 64)
          .withColumnRenamed("item", "token")
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |  FROM documents),
             |f AS (SELECT token FROM toks WHERE length(token) >= 2),
             |c AS (SELECT token, count(*) AS cnt FROM f GROUP BY token),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
             |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 20)
             |SELECT token, cnt,
             |(SELECT min(cnt) FROM top) * 1048576 > (SELECT n_total FROM tot) AS guaranteed
             |FROM top ORDER BY cnt DESC, token""".stripMargin)),

    // Incremental-aggregation maintenance: the 100 TB pattern where
    // yesterday's stored per-key partials merge with today's delta instead
    // of rescanning history. Both legs here derive from the same table
    // (filters pushed to the scan) to keep the query self-contained; at
    // scale the "hist" leg is a read of the stored aggregate. The oracle
    // is a FULL recompute over all events — proving merge(partials) ≡
    // recompute, the invariant that makes incremental ETL safe. Sums ride
    // DECIMAL so partial merge order cannot drift.
    QueryDef("incr_agg_merge",
      (s, dir) => {
        val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
        val ev = Tables.read(s, dir, "events")
          .select(col("user_id"), col("ts"),
            col("value").cast("decimal(18,6)").as("v"))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sum_v"))
        partial(ev.filter(col("ts") < cutoff))
          .unionByName(partial(ev.filter(col("ts") >= cutoff)))
          .groupBy("user_id")
          .agg(sum(col("n_events")).as("n_events"),
            sum(col("sum_v")).cast("double").as("sum_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // Calendar gap-fill + forward fill: per-user daily max, missing days
    // materialized with sequence()+explode (no driver loop, no cross join
    // against a global calendar — each user only generates its own span),
    // then last(ignoreNulls) carries the prior observation forward.
    QueryDef("ts_gapfill",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
        val daily = ev
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(col("value")).as("day_max"))
        val days = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        days.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            last(col("day_max"), ignoreNulls = true).over(w).as("filled"),
            col("day_max").isNull.as("is_gap"))
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
             |  FROM events GROUP BY 1, 2),
             |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             |  FROM daily GROUP BY 1),
             |days AS (SELECT user_id,
             |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM spans),
             |j AS (SELECT days.user_id, days.day, daily.day_max
             |  FROM days LEFT JOIN daily USING (user_id, day))
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             |last_value(day_max IGNORE NULLS) OVER (PARTITION BY user_id
             |  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |  AS filled,
             |day_max IS NULL AS is_gap
             |FROM j ORDER BY user_id, day""".stripMargin)),

    // Linear gap interpolation — ts_gapfill's forward-fill upgraded to
    // the line between the surrounding observations (sensor/metric
    // imputation). All arithmetic in scale-6 fixed-point longs (DECIMAL
    // extract, integer multiply, truncating div — Spark `div` and
    // DuckDB `//` both truncate toward zero) so interpolated values are
    // bit-identical across engines. Same grid and the same two
    // window-pass shape as gapfill: one partition pass computes
    // prev/next observation value AND day; boundary days are observed
    // by construction (the grid spans min..max observed), so interior
    // gaps always have both neighbors.
    QueryDef("ts_interpolate",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg((max(col("value")).cast("decimal(18,6)") * 1000000)
            .cast("long").as("v_us"))
        val days = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val g = days.join(daily, Seq("user_id", "day"), "left")
          .withColumn("dnum",
            datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
        val wPrev = Window.partitionBy("user_id").orderBy("dnum")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.partitionBy("user_id").orderBy("dnum")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        g.withColumn("pv", last(col("v_us"), ignoreNulls = true).over(wPrev))
          .withColumn("pd", last(when(col("v_us").isNotNull, col("dnum")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("v_us"), ignoreNulls = true).over(wNext))
          .withColumn("nd", first(when(col("v_us").isNotNull, col("dnum")),
            ignoreNulls = true).over(wNext))
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            when(col("v_us").isNotNull, col("v_us"))
              .otherwise(expr("pv + ((nv - pv) * (dnum - pd)) div (nd - pd)"))
              .as("interp_us"),
            col("v_us").isNull.as("is_gap"))
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    CAST(CAST(max(value) AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             |      AS v_us
             |  FROM events GROUP BY 1, 2),
             |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             |  FROM daily GROUP BY 1),
             |days AS (SELECT user_id,
             |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM spans),
             |g AS (SELECT days.user_id, days.day, daily.v_us,
             |  date_diff('day', DATE '1970-01-01', days.day) AS dnum
             |  FROM days LEFT JOIN daily USING (user_id, day)),
             |w AS (SELECT user_id, day, v_us, dnum,
             |  last_value(v_us IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY dnum ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |  last_value(CASE WHEN v_us IS NOT NULL THEN dnum END IGNORE NULLS)
             |    OVER (PARTITION BY user_id
             |    ORDER BY dnum ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |  first_value(v_us IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY dnum ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |  first_value(CASE WHEN v_us IS NOT NULL THEN dnum END IGNORE NULLS)
             |    OVER (PARTITION BY user_id
             |    ORDER BY dnum ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM g)
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             |  CASE WHEN v_us IS NOT NULL THEN v_us
             |       ELSE pv + ((nv - pv) * (dnum - pd)) // (nd - pd) END
             |    AS interp_us,
             |  v_us IS NULL AS is_gap
             |FROM w ORDER BY user_id, day""".stripMargin)),

    // Rolling z-score outliers over the trailing 20 events per user.
    // Cross-engine exactness trick: the window sums run over DECIMAL
    // (order-independent, bit-exact), only the final mean/std/z math is
    // double — written as the IDENTICAL expression in both engines, so
    // the threshold test can't flip between Spark and the oracle.
    QueryDef("ts_anomaly",
      (s, dir) => {
        val fr = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
        val vd = col("value").cast("decimal(18,6)")
        val base = Tables.read(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            count(vd).over(fr).as("n"),
            sum(vd).over(fr).cast("double").as("s1"),
            sum(vd * vd).over(fr).cast("double").as("s2"))
          .filter(col("n") >= 10)
        val mean = col("s1") / col("n")
        val std = sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1),
          lit(0.0)))
        val z = (col("value") - mean) / std
        base.filter(std > 0 && abs(z) > 2.5)
          .select(col("event_id"), col("user_id"), col("value"),
            round(z, 4).as("zscore"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH b AS (SELECT event_id, user_id, value, ts,
             |  CAST(value AS DECIMAL(18,6)) AS vd FROM events),
             |w AS (SELECT event_id, user_id, value,
             |  count(vd) OVER fr AS n,
             |  CAST(sum(vd) OVER fr AS DOUBLE) AS s1,
             |  CAST(sum(vd * vd) OVER fr AS DOUBLE) AS s2
             |  FROM b WINDOW fr AS (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
             |z AS (SELECT event_id, user_id, value, n, s1, s2,
             |  s1 / n AS mean,
             |  sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS std
             |  FROM w WHERE n >= 10)
             |SELECT event_id, user_id, value,
             |round((value - mean) / std, 4) AS zscore
             |FROM z WHERE std > 0 AND abs((value - mean) / std) > 2.5
             |ORDER BY user_id, event_id""".stripMargin)),

    // OHLC resample: per (user, day) open/high/low/close from ONE hash
    // aggregate — min_by/max_by carry the first/last value by exact
    // event-time micros, so no window pass and no second shuffle. (The
    // testdata has no (user, ts) ties; a tie-prone feed would key the
    // min_by on a composite micros|id value.)
    QueryDef("ts_resample_ohlc",
      (s, dir) => Tables.read(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          min_by(col("value"), col("us")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("us")).as("close"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("open"), col("high"), col("low"), col("close"), col("n_events"))
        .orderBy("user_id", "day"),
      Some("""SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             |arg_min(value, epoch_us(ts)) AS open,
             |max(value) AS high, min(value) AS low,
             |arg_max(value, epoch_us(ts)) AS close,
             |count(*) AS n_events
             |FROM events GROUP BY 1, 2
             |ORDER BY user_id, day""".stripMargin)),

    // Bounded-horizon EWMA (α = 1/4) over the daily value series, per
    // event type: weights (3/4)^j over the last 4 days scaled to the
    // integer quadruple (64, 48, 36, 27)/175, daily totals carried as
    // exact micro-unit longs — the whole smoothing path is integer
    // arithmetic, so it is bit-identical across engines and partial-sum
    // orders. One agg (daily totals) + one 4-lag window per type; days
    // without a full 4-day history are not emitted.
    QueryDef("ts_ewma",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("day")
        daily
          .withColumn("v1", lag("v", 1).over(w))
          .withColumn("v2", lag("v", 2).over(w))
          .withColumn("v3", lag("v", 3).over(w))
          .filter(col("v3").isNotNull)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("v").as("value_micro"),
            expr("(64*v + 48*v1 + 36*v2 + 27*v3) div 175").as("ewma_micro"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
             |         AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |lagged AS (
             |  SELECT event_type, day, v,
             |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
             |    lag(v, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2,
             |    lag(v, 3) OVER (PARTITION BY event_type ORDER BY day) AS v3
             |  FROM daily)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             |  v AS value_micro,
             |  CAST((64*v + 48*v1 + 36*v2 + 27*v3) // 175 AS BIGINT)
             |    AS ewma_micro
             |FROM lagged WHERE v3 IS NOT NULL
             |ORDER BY event_type, day""".stripMargin)),

    // Day-of-week seasonality profile: mean daily value total per
    // (event_type, weekday) in micro-unit integer division — "is the
    // weekend dip real". Two key-bounded aggs.
    QueryDef("ts_seasonality",
      (s, dir) => {
        Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("v"))
          .groupBy(col("event_type"), dayofweek(col("day")).cast("long")
            .as("weekday"))
          .agg(count(lit(1)).as("n_days"),
            expr("sum(v) div count(v)").as("mean_daily_micro"))
          .orderBy("event_type", "weekday")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
             |         AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, CAST(dayofweek(day) + 1 AS BIGINT) AS weekday,
             |  count(*) AS n_days,
             |  CAST(CAST(sum(v) AS BIGINT) // count(v) AS BIGINT)
             |    AS mean_daily_micro
             |FROM daily GROUP BY 1, 2 ORDER BY event_type, weekday""".stripMargin)),

    // Chi-square independence test between event type and weekday from
    // the contingency table: observed counts are integers, expected =
    // row·col/total in double (identical formula both engines), per-cell
    // (o−e)²/e rounded to 6 then DECIMAL-summed. The "is traffic mix
    // independent of weekday" significance screen.
    QueryDef("agg_chi_square",
      (s, dir) => {
        val cells = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), dayofweek(col("ts")).cast("long")
            .as("weekday"))
          .agg(count(lit(1)).as("o"))
        val wR = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        val wC = org.apache.spark.sql.expressions.Window
          .partitionBy("weekday")
        val wT = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        cells
          .withColumn("r", sum("o").over(wR))
          .withColumn("c", sum("o").over(wC))
          .withColumn("t", sum("o").over(wT))
          .withColumn("e", d(col("r")) * d(col("c")) / d(col("t")))
          .withColumn("term", round((d(col("o")) - col("e"))
            * (d(col("o")) - col("e")) / col("e"), 6))
          .agg(max(col("t")).as("n_events"),
            count(lit(1)).as("n_cells"),
            sum(col("term").cast("decimal(18,6)")).cast("double")
              .as("chi_square"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT)
             |      AS weekday, count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, weekday, o,
             |    CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             |    CAST(sum(o) OVER (PARTITION BY weekday) AS BIGINT) AS c,
             |    CAST(sum(o) OVER () AS BIGINT) AS t
             |  FROM cells),
             |terms AS (SELECT t,
             |    round((CAST(o AS DOUBLE)
             |           - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
             |             / CAST(t AS DOUBLE))
             |      * (CAST(o AS DOUBLE)
             |         - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
             |           / CAST(t AS DOUBLE))
             |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
             |         / CAST(t AS DOUBLE)), 6) AS term
             |  FROM m)
             |SELECT max(t) AS n_events, count(*) AS n_cells,
             |  CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
             |    AS chi_square
             |FROM terms""".stripMargin)),

    // Lag-1 autocorrelation of the daily value series per event type —
    // "is today's volume predictive of tomorrow's". Micro-unit longs
    // pair with their lag via one window, then ONE exact-moments agg per
    // type feeds the same identical-double-formula discipline as
    // agg_corr_matrix.
    QueryDef("agg_autocorr",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("day")
        val pairs = daily.withColumn("pv", lag("v", 1).over(w))
          .filter(col("pv").isNotNull)
          .select(col("event_type"),
            col("v").cast("decimal(24,0)").as("x"),
            col("pv").cast("decimal(24,0)").as("y"))
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        pairs.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("n"),
            round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
              / (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
                * sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
              6).as("autocorr_lag1"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
             |         AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT event_type,
             |    CAST(v AS DECIMAL(24,0)) AS x,
             |    CAST(lag(v, 1) OVER (PARTITION BY event_type ORDER BY day)
             |         AS DECIMAL(24,0)) AS y
             |  FROM daily),
             |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
             |    sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx,
             |    sum(y*y) AS syy
             |  FROM p WHERE y IS NOT NULL GROUP BY 1)
             |SELECT event_type, n,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |   / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             |    AS autocorr_lag1
             |FROM m ORDER BY event_type""".stripMargin)),

    // Two-sample Kolmogorov-Smirnov test between every pair of event
    // types' value distributions — the UNBINNED drift detector
    // complementing curation_js_divergence's binned-histogram JS: D is
    // the supremum of |ECDF_a − ECDF_b|, evaluated at every sample point
    // (ECDFs only step there, and both engines' RANGE tie semantics put
    // each evaluation AFTER all rows of equal value — the correct
    // right-limit). The per-pair running counts reuse the same
    // DISTRIBUTED TWO-PHASE PREFIX SUM as ops/Sweep: integer-value
    // buckets give per-(pair, bucket) partial counts (≤ ~500 buckets —
    // value-range-bounded), a tiny carry window, and per-bucket
    // partitioned running sums — no per-pair global window ever sees the
    // sample mass. Counts stay exact BIGINT; ECDF division and the
    // √(n_a·n_b/(n_a+n_b))·D statistic convert to double only in the
    // final fixed expression.
    QueryDef("profile_ks_test",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .select(col("event_type").as("t"), col("value"))
        val types = ev.select(col("t")).distinct()
        val pairs = types.as("x").join(types.as("y"), col("x.t") < col("y.t"))
          .select(col("x.t").as("ta"), col("y.t").as("tb"))
        val sa = ev.join(broadcast(pairs), col("t") === col("ta"))
          .select(col("ta"), col("tb"), col("value"),
            lit(1L).as("ia"), lit(0L).as("ib"))
        val sb = ev.join(broadcast(pairs), col("t") === col("tb"))
          .select(col("ta"), col("tb"), col("value"),
            lit(0L).as("ia"), lit(1L).as("ib"))
        val u = sa.unionByName(sb)
          .withColumn("bucket", floor(col("value")).cast("long"))
        val perBucket = u.groupBy("ta", "tb", "bucket")
          .agg(sum(col("ia")).as("da"), sum(col("ib")).as("db"))
        val wOff = Window.partitionBy("ta", "tb").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = perBucket
          .withColumn("ca0", coalesce(sum(col("da")).over(wOff), lit(0L)))
          .withColumn("cb0", coalesce(sum(col("db")).over(wOff), lit(0L)))
          .select("ta", "tb", "bucket", "ca0", "cb0")
        val wRun = Window.partitionBy("ta", "tb", "bucket").orderBy("value")
        val tot = u.groupBy("ta", "tb")
          .agg(sum(col("ia")).as("n_a"), sum(col("ib")).as("n_b"))
        def d(c: Column) = c.cast("double")
        u.join(broadcast(offsets), Seq("ta", "tb", "bucket"))
          .withColumn("ca", col("ca0") + sum(col("ia")).over(wRun))
          .withColumn("cb", col("cb0") + sum(col("ib")).over(wRun))
          .join(broadcast(tot), Seq("ta", "tb"))
          .withColumn("diff",
            abs(d(col("ca")) / d(col("n_a")) - d(col("cb")) / d(col("n_b"))))
          .groupBy("ta", "tb")
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            max(col("diff")).as("dmax"))
          .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
            round(col("dmax"), 6).as("d_stat"),
            round(sqrt(d(col("n_a")) * d(col("n_b")) /
              (d(col("n_a")) + d(col("n_b")))) * col("dmax"), 6)
              .as("ks_stat"))
          .orderBy("ta", "tb")
      },
      Some("""WITH t AS (SELECT DISTINCT event_type AS ty FROM events),
             |p AS (SELECT a.ty AS ta, b.ty AS tb
             |      FROM t a JOIN t b ON a.ty < b.ty),
             |u AS (SELECT p.ta, p.tb, e.value,
             |        CASE WHEN e.event_type = p.ta
             |          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
             |          END AS ia,
             |        CASE WHEN e.event_type = p.tb
             |          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
             |          END AS ib
             |      FROM events e
             |      JOIN p ON e.event_type IN (p.ta, p.tb)),
             |r AS (SELECT ta, tb,
             |        CAST(sum(ia) OVER (PARTITION BY ta, tb ORDER BY value)
             |          AS BIGINT) AS ca,
             |        CAST(sum(ib) OVER (PARTITION BY ta, tb ORDER BY value)
             |          AS BIGINT) AS cb
             |      FROM u),
             |n AS (SELECT ta, tb, CAST(sum(ia) AS BIGINT) AS n_a,
             |        CAST(sum(ib) AS BIGINT) AS n_b
             |      FROM u GROUP BY 1, 2),
             |m AS (SELECT r.ta, r.tb,
             |        max(abs(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)
             |          - CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))) AS dmax
             |      FROM r JOIN n ON n.ta = r.ta AND n.tb = r.tb
             |      GROUP BY 1, 2)
             |SELECT m.ta, m.tb, n.n_a, n.n_b, round(dmax, 6) AS d_stat,
             |  round(sqrt(CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE)
             |    / (CAST(n.n_a AS DOUBLE) + CAST(n.n_b AS DOUBLE)))
             |    * dmax, 6) AS ks_stat
             |FROM m JOIN n ON n.ta = m.ta AND n.tb = m.tb
             |ORDER BY m.ta, m.tb""".stripMargin)),

    // Lagged CROSS-correlation between the hourly 'view' and 'purchase'
    // count series — the lead/lag detector agg_autocorr can't express
    // (does purchasing trail browsing, and by how many hours?). Both
    // series are zero-filled onto the complete hour grid (a 1-row min/max
    // agg explodes to |hours| rows — TIME-bounded, ~87k rows/decade, not
    // data-bounded), each lag in −3..3 joins the shifted grids hash-equi
    // on h+lag, and Pearson r comes from EXACT BIGINT moment sums
    // (hourly counts < 2^20, squares summed over 10^5 hours stay < 2^63)
    // converted to double only in the final fixed expression — the sums
    // commute, so combiner order cannot move the result. Zero-variance
    // windows surface NULL, not NaN (IEEE 0/0 would hash-drift).
    QueryDef("ts_cross_correlation",
      (s, dir) => {
        // floor-div form (not `div`, which truncates toward zero): keeps
        // pre-1970 timestamps in the same bucket as DuckDB's flooring `//`
        val hourly = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .groupBy(col("event_type"),
            expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
              " div 3600000000").as("h"))
          .agg(count(lit(1)).as("c"))
        val rng = hourly.agg(min("h").as("h0"), max("h").as("h1"))
        val grid = rng.select(explode(sequence(col("h0"), col("h1"))).as("h"))
        def series(t: String, hc: String, vc: String) = grid
          .join(hourly.filter(col("event_type") === t)
            .select(col("h").as("jh"), col("c")), col("h") === col("jh"), "left")
          .select(col("h").as(hc), coalesce(col("c"), lit(0L)).as(vc))
        val x = series("view", "h", "xv")
        val y = series("purchase", "hy", "yv")
        val lags = s.range(-3, 4).select(col("id").as("lag_h"))
        def d(c: Column) = c.cast("double")
        val m = x.crossJoin(broadcast(lags))
          .join(y, col("hy") === col("h") + col("lag_h"))
          .groupBy("lag_h")
          .agg(count(lit(1)).as("n"), sum("xv").as("sx"), sum("yv").as("sy"),
            sum(col("xv") * col("yv")).as("sxy"),
            sum(col("xv") * col("xv")).as("sxx"),
            sum(col("yv") * col("yv")).as("syy"))
          .withColumn("num",
            d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          .withColumn("den",
            sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
              sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))
        m.select(col("lag_h"), col("n"),
            when(col("den") > 0, round(col("num") / col("den"), 6))
              .as("xcorr"))
          .orderBy("lag_h")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             |    count(*) AS c
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |  GROUP BY 1, 2),
             |rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
             |grid AS (SELECT unnest(generate_series(h0, h1)) AS h FROM rng),
             |x AS (SELECT g.h, CAST(coalesce(v.c, 0) AS BIGINT) AS xv
             |      FROM grid g LEFT JOIN (SELECT h, c FROM hourly
             |        WHERE event_type = 'view') v ON v.h = g.h),
             |y AS (SELECT g.h AS hy, CAST(coalesce(p.c, 0) AS BIGINT) AS yv
             |      FROM grid g LEFT JOIN (SELECT h, c FROM hourly
             |        WHERE event_type = 'purchase') p ON p.h = g.h),
             |lags AS (SELECT CAST(unnest(generate_series(-3, 3)) AS BIGINT)
             |           AS lag_h),
             |m AS (SELECT lag_h, count(*) AS n,
             |        CAST(sum(xv) AS BIGINT) AS sx,
             |        CAST(sum(yv) AS BIGINT) AS sy,
             |        CAST(sum(xv * yv) AS BIGINT) AS sxy,
             |        CAST(sum(xv * xv) AS BIGINT) AS sxx,
             |        CAST(sum(yv * yv) AS BIGINT) AS syy
             |      FROM x CROSS JOIN lags JOIN y ON hy = h + lag_h
             |      GROUP BY 1),
             |m2 AS (SELECT lag_h, n,
             |        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
             |        sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den
             |      FROM m)
             |SELECT lag_h, n,
             |  CASE WHEN den > 0 THEN round(num / den, 6) END AS xcorr
             |FROM m2 ORDER BY lag_h""".stripMargin)),

    // Rolling 7-day median of the daily value series per event type —
    // the robust-smoothing counterpart of ts_ewma. Computed as the
    // middle element of the sorted micro-unit frame array in BOTH
    // engines (never each engine's own median(), whose interpolation
    // conventions differ): integer micro longs in, integer median out.
    // Frames are ≤7 elements, so the per-row sort is constant work.
    QueryDef("ts_rolling_median",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
        daily
          .withColumn("frame", sort_array(collect_list(col("v")).over(w)))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("v").as("value_micro"),
            element_at(col("frame"),
              ((size(col("frame")) + 1) / 2).cast("int")).as("med_micro"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
             |         AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |f AS (SELECT event_type, day, v,
             |    list_sort(list(v) OVER (PARTITION BY event_type
             |      ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |      AS frame
             |  FROM daily)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             |  v AS value_micro,
             |  frame[CAST((len(frame) + 1) // 2 AS INT)] AS med_micro
             |FROM f ORDER BY event_type, day""".stripMargin)),

    // CUSUM changepoint detection on the daily value series per event
    // type: cumulative sum of deviations from the series mean peaks at
    // the regime change. Micro-unit longs and integer division keep the
    // whole statistic exact; the argmax day (ties → earliest) is a
    // window rank over the ≤31-row per-type series.
    QueryDef("ts_changepoint",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(col("value").cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("v"))
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        val wCum = wAll.orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val withM = daily
          .withColumn("sv", sum("v").over(wAll))
          .withColumn("nv", count(lit(1)).over(wAll))
          .withColumn("m", expr("sv div nv"))
          .withColumn("cusum", sum(col("v") - col("m")).over(wCum))
          .withColumn("acu", abs(col("cusum")))
        withM
          .withColumn("rn", row_number().over(
            wAll.orderBy(desc("acu"), col("day"))))
          .filter(col("rn") === 1)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("change_day"),
            col("acu").as("max_abs_cusum"), col("nv").as("n_days"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
             |         AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, day, v,
             |    CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT)
             |      // count(v) OVER (PARTITION BY event_type) AS m,
             |    count(v) OVER (PARTITION BY event_type) AS nv
             |  FROM daily),
             |c AS (SELECT event_type, day, nv,
             |    abs(CAST(sum(v - m) OVER (PARTITION BY event_type
             |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS acu
             |  FROM m),
             |r AS (SELECT event_type, day, acu, nv, row_number() OVER (
             |    PARTITION BY event_type ORDER BY acu DESC, day) AS rn
             |  FROM c)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
             |  CAST(acu AS BIGINT) AS max_abs_cusum,
             |  CAST(nv AS BIGINT) AS n_days
             |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // Wide→long unpivot of the lineitem measures (Dataset.unpivot — plans
    // as a map-side Expand, no shuffle, no UDF; the inverse of
    // pivot_status).
    QueryDef("unpivot_melt",
      (s, dir) => Tables.read(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(m => s"SELECT l_orderkey, l_linenumber, '$m' AS measure, " +
          s"$m AS val FROM lineitem")
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY l_orderkey, l_linenumber, measure")))
  ,

    // Robust (MAD) outlier census over order totals — the
    // median-absolute-deviation twin of the Tukey fences below, immune
    // to the outliers it hunts (the IQR itself moves when the tail is
    // heavy; the MAD doesn't). TWO exact global medians through the
    // native rank operator (values, then absolute residuals — both in
    // exact cents), and the 3σ-equivalent threshold 3·1.4826·MAD rides
    // as the INTEGER comparison d·10000 > mad·44478, so the flag line is
    // bit-identical cross-engine with zero float math anywhere.
    QueryDef("profile_outliers_mad",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT)").as("c"))
        val n = o.agg(count(lit(1)).as("n_tot"))
        val medRk = greatest(lit(1L), expr("(n_tot + 1) div 2"))
        val r = graft.plans.GlobalRank.withRowNumber(o, "rk",
          ("c", true), ("o_orderkey", true))
        val med = r.crossJoin(broadcast(n)).filter(col("rk") === medRk)
          .select(col("c").as("med"))
        val dev = o.crossJoin(broadcast(med))
          .select(col("o_orderkey"), col("c"),
            abs(col("c") - col("med")).as("d"), col("med"))
        val r2 = graft.plans.GlobalRank.withRowNumber(dev, "rk2",
          ("d", true), ("o_orderkey", true))
        val mad = r2.crossJoin(broadcast(n)).filter(col("rk2") === medRk)
          .select(col("d").as("mad"))
        dev.crossJoin(broadcast(mad)).crossJoin(broadcast(n))
          .agg(max(col("n_tot")).as("n_rows"),
            max(col("med")).as("median_cents"),
            max(col("mad")).as("mad_cents"),
            sum(when(col("d") * 10000L > col("mad") * 44478L, 1L)
              .otherwise(0L)).as("n_outliers"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS c
             |  FROM orders),
             |n AS (SELECT count(*) AS n_tot FROM o),
             |r AS (SELECT c, row_number() OVER (ORDER BY c, o_orderkey)
             |    AS rk FROM o),
             |m AS (SELECT c AS med FROM r CROSS JOIN n
             |  WHERE rk = greatest(1, (n_tot + 1) // 2)),
             |dev AS (SELECT o.o_orderkey, c, abs(c - med) AS d, med
             |  FROM o CROSS JOIN m),
             |r2 AS (SELECT d, row_number() OVER (ORDER BY d, o_orderkey)
             |    AS rk2 FROM dev),
             |mad AS (SELECT d AS mad FROM r2 CROSS JOIN n
             |  WHERE rk2 = greatest(1, (n_tot + 1) // 2))
             |SELECT CAST(max(n_tot) AS BIGINT) AS n_rows,
             |  CAST(max(med) AS BIGINT) AS median_cents,
             |  CAST(max(mad) AS BIGINT) AS mad_cents,
             |  CAST(sum(CASE WHEN d * 10000 > mad * 44478 THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_outliers
             |FROM dev CROSS JOIN mad CROSS JOIN n""".stripMargin)),

    // Tukey-fence outlier census over order totals: EXACT Q1/Q3 via the
    // native distributed row_number (the window_exact_quantiles rank
    // definition — value at rank max(1, n·q div 100), so quartiles are
    // observed values, not interpolations, and cross-engine identical),
    // 1.5·IQR fences, then one combinable census pass. The profiling
    // face of GlobalRank: exact order statistics at any N, no collect,
    // no percentile_approx error bars.
    QueryDef("profile_outliers_iqr",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val r = graft.plans.GlobalRank.withRowNumber(o, "rk",
          ("o_totalprice", true), ("o_orderkey", true))
        val n = o.agg(count(lit(1)).as("n_tot"))
        val q1rk = greatest(lit(1L), expr("n_tot * 25 div 100"))
        val q3rk = greatest(lit(1L), expr("n_tot * 75 div 100"))
        val qs = r.crossJoin(broadcast(n))
          .filter(col("rk") === q1rk || col("rk") === q3rk)
          .agg(min(when(col("rk") === q1rk, col("o_totalprice")))
            .as("q1"),
            max(when(col("rk") === q3rk, col("o_totalprice")))
              .as("q3"))
        o.crossJoin(broadcast(qs)).crossJoin(broadcast(n))
          .agg(max(col("n_tot")).as("n_rows"),
            max(col("q1")).as("q1"), max(col("q3")).as("q3"),
            sum(when(col("o_totalprice") <
              col("q1") - (col("q3") - col("q1")) * 1.5, 1L)
              .otherwise(0L)).as("n_below"),
            sum(when(col("o_totalprice") >
              col("q3") + (col("q3") - col("q1")) * 1.5, 1L)
              .otherwise(0L)).as("n_above"))
          .select(col("n_rows"), col("q1"), col("q3"),
            round(col("q1") - (col("q3") - col("q1")) * 1.5, 2)
              .as("lo_fence"),
            round(col("q3") + (col("q3") - col("q1")) * 1.5, 2)
              .as("hi_fence"),
            col("n_below"), col("n_above"))
      },
      Some("""WITH r AS (SELECT o_totalprice,
             |    row_number() OVER (ORDER BY o_totalprice, o_orderkey)
             |      AS rk FROM orders),
             |n AS (SELECT count(*) AS n_tot FROM orders),
             |q AS (SELECT
             |    min(CASE WHEN rk = greatest(1, n_tot * 25 // 100)
             |      THEN o_totalprice END) AS q1,
             |    max(CASE WHEN rk = greatest(1, n_tot * 75 // 100)
             |      THEN o_totalprice END) AS q3
             |  FROM r CROSS JOIN n)
             |SELECT (SELECT CAST(n_tot AS BIGINT) FROM n) AS n_rows,
             |  q1, q3,
             |  round(q1 - (q3 - q1) * 1.5, 2) AS lo_fence,
             |  round(q3 + (q3 - q1) * 1.5, 2) AS hi_fence,
             |  (SELECT CAST(sum(CASE WHEN o_totalprice <
             |      q1 - (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT)
             |    FROM orders) AS n_below,
             |  (SELECT CAST(sum(CASE WHEN o_totalprice >
             |      q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT)
             |    FROM orders) AS n_above
             |FROM q""".stripMargin))
  )
}
