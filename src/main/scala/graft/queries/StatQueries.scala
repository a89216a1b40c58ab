package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.Sql
import graft.core.{GraftFunctions, Tables}

/** Round-12 fourth wave: statistical diagnostics a curation/analytics
  * pipeline runs before trusting its data — model-lift tables, survival
  * curves, join-key skew censuses, inequality decomposition, trend
  * significance, and sentence-level text structure. Discipline as
  * established: exact integer/decimal arithmetic wherever possible
  * (basis points / centi-units / decimal-summed 12-dp log terms), global
  * ranks through the native distributed row_number operator
  * (plans/GlobalRank), and every remaining global window bounded by a
  * DOMAIN (10 deciles, calendar-day durations), never by the corpus.
  */
object StatQueries {

  val all: Seq[QueryDef] = Seq(

    // Decile lift/gains table for the scored frame eval_auc/eval_pr_auc
    // already gate (purchase=positive, value=score): the model-quality
    // view every targeting pipeline reads. Global rank over (score desc,
    // id) runs through the NATIVE distributed row_number operator — one
    // range exchange + a shuffle-read count pass, no single-task sort —
    // then decile = ((rank-1)*10) div N from a 1-row broadcast count.
    // Gains and lift are exact integer basis points (cum_pos*1e4 div
    // pos_total; cum_pos*N*1e4 div (cum_n*pos_total)); the only window
    // is the 10-row decile grid.
    QueryDef("eval_lift",
      (s, dir) => {
        val sc = Tables.read(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view") &&
            col("value").isNotNull)
          .select(col("event_id"), col("value").as("score"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("label"))
        val tot = sc.agg(count(lit(1)).as("n_total"),
          sum("label").as("n_pos_total"))
        val ranked = graft.plans.GlobalRank.withRowNumber(sc, "rk",
          ("score", false), ("event_id", true))
        val dec = ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr("(rk - 1) * 10 div n_total + 1"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"), sum("label").as("n_pos"),
            first("n_total").as("n_total"),
            first("n_pos_total").as("n_pos_total"))
        val w = Window.orderBy("decile") // 10-row decile grid (bounded)
        dec
          .withColumn("cum_n", sum("n").over(w))
          .withColumn("cum_pos", sum("n_pos").over(w))
          .select(col("decile"), col("n"), col("n_pos"),
            expr("cum_pos * 10000 div n_pos_total").as("gain_bp"),
            expr("cum_pos * n_total * 10000 div (cum_n * n_pos_total)")
              .as("lift_bp"))
          .orderBy("decile")
      },
      Some("""WITH scored AS (SELECT event_id AS id, value AS score,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
             |  FROM events
             |  WHERE event_type IN ('purchase', 'view')
             |    AND value IS NOT NULL),
             |tot AS (SELECT count(*) AS n_total, sum(label) AS n_pos_total
             |  FROM scored),
             |r AS (SELECT label,
             |    row_number() OVER (ORDER BY score DESC, id) AS rk
             |  FROM scored),
             |d AS (SELECT (rk - 1) * 10 // n_total + 1 AS decile,
             |    count(*) AS n, sum(label) AS n_pos
             |  FROM r CROSS JOIN tot GROUP BY 1),
             |c AS (SELECT decile, n, n_pos,
             |    sum(n) OVER (ORDER BY decile) AS cum_n,
             |    sum(n_pos) OVER (ORDER BY decile) AS cum_pos FROM d)
             |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(cum_pos * 10000 // n_pos_total AS BIGINT) AS gain_bp,
             |  CAST(cum_pos * n_total * 10000 // (cum_n * n_pos_total)
             |    AS BIGINT) AS lift_bp
             |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin)),

    // Spearman rank correlation between quantity and price over lineitem
    // — the monotone-association number, exact under MASSIVE ties
    // (l_quantity has ~50 distinct values). Fractional average ranks ride
    // as exact INTEGERS doubled through the NATIVE GlobalRank AvgRankX2
    // mode (2·avgrank = 2·first_rank + tie_size − 1, one pass per
    // column) — two range exchanges total, no single-task window, no
    // per-value join. Moments are exact DECIMAL(38,0) sums; ρ's one
    // division runs on exact integers cast to double, 6-dp. The oracle
    // derives the same integer via rank_asc + (n+1) − rank_desc.
    QueryDef("stat_spearman",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT)").as("y"))
        val GR = graft.plans.GlobalRank
        val ranked = GR.withAvgRankX2(
          GR.withAvgRankX2(li, "ax0", ("x", true)), "ay0", ("y", true))
        val d = ranked.select(col("ax0").cast("decimal(38,0)").as("ax"),
          col("ay0").cast("decimal(38,0)").as("ay"))
        d.agg(count(lit(1)).as("n_rows"),
            sum(col("ax")).as("sx"), sum(col("ay")).as("sy"),
            sum(col("ax") * col("ax")).as("sxx"),
            sum(col("ay") * col("ay")).as("syy"),
            sum(col("ax") * col("ay")).as("sxy"))
          .select(col("n_rows"),
            round((col("n_rows") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n_rows") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n_rows") * col("syy") - col("sy") * col("sy"))
                  .cast("double"))), 6).as("spearman_rho"))
      },
      Some("""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS y
             |  FROM lineitem),
             |n AS (SELECT count(*) AS n_t FROM li),
             |r AS (SELECT
             |    CAST(rank() OVER (ORDER BY x) + n_t + 1 -
             |      rank() OVER (ORDER BY x DESC) AS DECIMAL(38,0)) AS ax,
             |    CAST(rank() OVER (ORDER BY y) + n_t + 1 -
             |      rank() OVER (ORDER BY y DESC) AS DECIMAL(38,0)) AS ay
             |  FROM li CROSS JOIN n),
             |s AS (SELECT count(*) AS n_rows,
             |    sum(ax) AS sx, sum(ay) AS sy, sum(ax * ax) AS sxx,
             |    sum(ay * ay) AS syy, sum(ax * ay) AS sxy FROM r)
             |SELECT CAST(n_rows AS BIGINT) AS n_rows,
             |  round(CAST(n_rows * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE)) *
             |     sqrt(CAST(n_rows * syy - sy * sy AS DOUBLE))), 6)
             |    AS spearman_rho
             |FROM s""".stripMargin)),

    // Mann-Whitney U (Wilcoxon rank-sum) between urgent and low-priority
    // order totals over $100 price bands — the nonparametric
    // two-sample location test, tie-corrected. Pooled fractional ranks
    // ride doubled (exact integers) through the native GlobalRank
    // AvgRankX2 mode in ONE pass; U statistics are exact integers
    // (also doubled); the z-score's tie-corrected variance folds the
    // exact Σ(t³−t) band census. The z expression is written identically
    // in both engines (same operation order) so the one float pipeline
    // agrees to the 6th dp.
    QueryDef("stat_mann_whitney",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
            "AS BIGINT) div 10000").as("v"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("g"))
        val ranked = graft.plans.GlobalRank.withAvgRankX2(o, "ax2",
          ("v", true))
        val ties = o.groupBy("v").agg(count(lit(1)).as("t"))
          .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t"))
            .as("tie_term"))
        val sums = ranked
          .select(col("g"), col("ax2"))
          .agg(count(lit(1)).as("n"),
            sum(col("g")).as("n1"),
            sum(when(col("g") === 1, col("ax2")).otherwise(lit(0L)))
              .as("r1x2"))
        sums.crossJoin(broadcast(ties))
          .select(col("n1"), (col("n") - col("n1")).as("n2"),
            (col("r1x2") - col("n1") * (col("n1") + 1)).as("u1x2"),
            col("n"), col("tie_term"))
          .select(col("n1"), col("n2"), col("u1x2").as("u1_doubled"),
            (lit(2L) * col("n1") * col("n2") - col("u1x2"))
              .as("u2_doubled"),
            round((col("u1x2") - col("n1") * col("n2")).cast("double") /
              (lit(2.0) * sqrt(col("n1").cast("double") * col("n2") /
                lit(12.0) * ((col("n") + 1) -
                  col("tie_term").cast("double") /
                    (col("n").cast("double") * (col("n") - 1))))), 6)
              .as("z_score"))
      },
      Some("""WITH o AS (SELECT
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // 10000 AS v,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             |      AS g
             |  FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |n AS (SELECT count(*) AS n_t FROM o),
             |r AS (SELECT g, rank() OVER (ORDER BY v) + n_t + 1 -
             |    rank() OVER (ORDER BY v DESC) AS ax2
             |  FROM o CROSS JOIN n),
             |ties AS (SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
             |    AS tie_term
             |  FROM (SELECT count(*) AS t FROM o GROUP BY v)),
             |s AS (SELECT count(*) AS n, sum(g) AS n1,
             |    sum(CASE WHEN g = 1 THEN ax2 ELSE 0 END) AS r1x2 FROM r),
             |u AS (SELECT n1, n - n1 AS n2,
             |    r1x2 - n1 * (n1 + 1) AS u1x2, n, tie_term
             |  FROM s CROSS JOIN ties)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  CAST(u1x2 AS BIGINT) AS u1_doubled,
             |  CAST(2 * n1 * n2 - u1x2 AS BIGINT) AS u2_doubled,
             |  round(CAST(u1x2 - n1 * n2 AS DOUBLE) /
             |    (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
             |      ((n + 1) - CAST(tie_term AS DOUBLE) /
             |        (CAST(n AS DOUBLE) * (n - 1))))), 6) AS z_score
             |FROM u""".stripMargin)),

    // Two-sample Kolmogorov-Smirnov D between the same two priority
    // groups' price-band distributions — the distribution-shape
    // complement to Mann-Whitney's location test. The cumulative runs
    // over the $100 price-BAND domain (bounded by the price range, not
    // the row count — the eval_auc window class); D's numerator
    // max|cum1·n2 − cum2·n1| stays an exact integer, one 6-dp division
    // at the end.
    QueryDef("stat_ks_bands",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
            "AS BIGINT) div 10000").as("v"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("g"))
        val tot = o.agg(sum(col("g")).as("n1_t"),
          sum(lit(1L) - col("g")).as("n2_t"))
        val bands = o.groupBy("v")
          .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
        val w = Window.orderBy("v") // $100 price-band domain (bounded)
        bands
          .withColumn("cum1", sum("c1").over(w))
          .withColumn("cum2", sum("c2").over(w))
          .crossJoin(broadcast(tot))
          .agg(max(abs(col("cum1") * col("n2_t") -
            col("cum2") * col("n1_t"))).as("d_num"),
            max(col("n1_t")).as("n1"), max(col("n2_t")).as("n2"))
          .select(col("n1"), col("n2"), col("d_num"),
            round(col("d_num").cast("double") /
              (col("n1").cast("double") * col("n2")), 6).as("ks_d"))
      },
      Some("""WITH o AS (SELECT
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // 10000 AS v,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             |      AS g
             |  FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |tot AS (SELECT sum(g) AS n1_t, sum(1 - g) AS n2_t FROM o),
             |b AS (SELECT v, sum(g) AS c1, sum(1 - g) AS c2
             |  FROM o GROUP BY v),
             |c AS (SELECT sum(c1) OVER (ORDER BY v) AS cum1,
             |    sum(c2) OVER (ORDER BY v) AS cum2 FROM b),
             |d AS (SELECT max(abs(cum1 * n2_t - cum2 * n1_t)) AS d_num,
             |    max(n1_t) AS n1, max(n2_t) AS n2 FROM c CROSS JOIN tot)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  CAST(d_num AS BIGINT) AS d_num,
             |  round(CAST(d_num AS DOUBLE) /
             |    (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d
             |FROM d""".stripMargin)),

    // Kruskal-Wallis H across ALL FIVE order priorities (the k-group
    // generalization of stat_mann_whitney): do the groups share a price
    // distribution? Pooled doubled average ranks through the native
    // tie-aware GlobalRank; per-group rank sums are exact integers; the
    // 5 per-group double terms each round to 6 dp and DECIMAL-sum
    // (order-independent — the float recurrence discipline) before the
    // one final H pipeline, mirrored operation-for-operation in the
    // oracle. Tie-corrected (the band census's exact Σ(t³−t)).
    QueryDef("stat_kruskal_wallis",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
            "AS BIGINT) div 10000").as("v"),
            col("o_orderpriority").as("g"))
        val ranked = graft.plans.GlobalRank.withAvgRankX2(o, "ax2",
          ("v", true))
        val ties = o.groupBy("v").agg(count(lit(1)).as("t"))
          .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t"))
            .as("tie_term"))
        val byG = ranked
          .select(col("g"), col("ax2"))
          .groupBy("g")
          .agg(count(lit(1)).as("n_g"), sum(col("ax2")).as("r2_g"))
        val s0 = byG
          .select(col("n_g"), col("r2_g"),
            round(col("r2_g").cast("double") * col("r2_g") /
              (lit(4.0) * col("n_g")), 6).cast("decimal(38,6)").as("term"))
          .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
            sum(col("term")).as("terms"))
        s0.crossJoin(broadcast(ties))
          .select(col("n"), col("k"),
            round(lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
              col("terms").cast("double") - lit(3.0) * (col("n") + 1), 6)
              .as("h"),
            round((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
              col("terms").cast("double") - lit(3.0) * (col("n") + 1)) /
              (lit(1.0) - col("tie_term").cast("double") /
                (col("n").cast("double") * col("n") * col("n") - col("n"))),
              6).as("h_tie_adj"))
      },
      Some("""WITH o AS (SELECT
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // 10000 AS v,
             |    o_orderpriority AS g
             |  FROM orders),
             |n AS (SELECT count(*) AS n_t FROM o),
             |r AS (SELECT g, rank() OVER (ORDER BY v) + n_t + 1 -
             |    rank() OVER (ORDER BY v DESC) AS ax2
             |  FROM o CROSS JOIN n),
             |ties AS (SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
             |    AS tie_term
             |  FROM (SELECT count(*) AS t FROM o GROUP BY v)),
             |bg AS (SELECT g, count(*) AS n_g, sum(ax2) AS r2_g
             |  FROM r GROUP BY g),
             |s AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS k,
             |    sum(CAST(round(CAST(r2_g AS DOUBLE) * r2_g /
             |      (4.0 * n_g), 6) AS DECIMAL(38,6))) AS terms
             |  FROM bg)
             |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |  round(12.0 / (CAST(n AS DOUBLE) * (n + 1)) *
             |    CAST(terms AS DOUBLE) - 3.0 * (n + 1), 6) AS h,
             |  round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) *
             |    CAST(terms AS DOUBLE) - 3.0 * (n + 1)) /
             |    (1.0 - CAST(tie_term AS DOUBLE) /
             |      (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_tie_adj
             |FROM s CROSS JOIN ties""".stripMargin)),

    // Kaplan-Meier survival for time-to-first-high-value-purchase
    // (value ≥ 150 — ~5% of purchases, so roughly half the users convert
    // inside the corpus window and the rest are right-censored at their
    // last observed event: a REAL censoring mix, not a degenerate CDF).
    // The life table groups by CALENDAR-DAY duration — a domain-bounded
    // frame (≤ the corpus date range in days, independent of user
    // count) — so the cumulative windows are grid-sized. Survival =
    // exp(Σ ln(1 - d/n)): each log term rounds to 12 dp and decimal-sums
    // (order-independent across engines) before the single exp; an
    // absorbing step (d = n_at_risk) pins survival to exactly 0 rather
    // than feeding ln(0) into the sum.
    QueryDef("events_survival",
      (s, dir) => {
        val ev = Tables.read(s, dir, "events")
          .select("user_id", "ts", "event_type", "value")
        val u = ev.groupBy("user_id")
          .agg(min("ts").as("f"), max("ts").as("l"),
            min(when(col("event_type") === "purchase" &&
              col("value") >= 150.0, col("ts"))).as("p"))
        val life = u
          .select(
            datediff(to_date(coalesce(col("p"), col("l"))),
              to_date(col("f"))).cast("long").as("t"),
            when(col("p").isNotNull, 1L).otherwise(0L).as("ev"))
        val tot = life.agg(count(lit(1)).as("n_users"))
        val g = life.groupBy("t")
          .agg(count(lit(1)).as("n_all"), sum("ev").as("deaths"))
        val w = Window.orderBy("t") // calendar-day duration domain
        val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
        val c = g.crossJoin(broadcast(tot))
          .withColumn("n_risk",
            col("n_users") - coalesce(sum("n_all").over(wPrev), lit(0L)))
        c.withColumn("term",
            when(col("deaths") >= col("n_risk"),
              lit(null).cast("decimal(28,12)"))
              .otherwise(round(
                log(lit(1.0) - col("deaths").cast("double") / col("n_risk")),
                12).cast("decimal(28,12)")))
          .withColumn("logs", sum("term").over(w))
          .withColumn("absorbed",
            sum(when(col("deaths") >= col("n_risk"), 1L).otherwise(0L))
              .over(w))
          .filter(col("deaths") > 0)
          .select(col("t").as("t_days"), col("n_risk"), col("deaths"),
            when(col("absorbed") > 0, lit(0.0))
              .otherwise(round(exp(col("logs").cast("double")), 6))
              .as("survival"))
          .orderBy("t_days")
      },
      Some("""WITH u AS (SELECT user_id, min(ts) AS f, max(ts) AS l,
             |    min(CASE WHEN event_type = 'purchase' AND value >= 150.0
             |      THEN ts END) AS p
             |  FROM events GROUP BY 1),
             |life AS (SELECT
             |    CAST(date_diff('day', CAST(f AS DATE),
             |      CAST(coalesce(p, l) AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
             |  FROM u),
             |tot AS (SELECT count(*) AS n_users FROM life),
             |g AS (SELECT t, count(*) AS n_all, sum(ev) AS deaths
             |  FROM life GROUP BY 1),
             |c AS (SELECT t, deaths,
             |    n_users - coalesce(sum(n_all) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n_risk
             |  FROM g CROSS JOIN tot),
             |s AS (SELECT t, n_risk, deaths,
             |    sum(CASE WHEN deaths >= n_risk THEN NULL
             |      ELSE CAST(round(ln(1.0 - CAST(deaths AS DOUBLE) / n_risk),
             |        12) AS DECIMAL(28,12)) END) OVER (ORDER BY t) AS logs,
             |    CAST(sum(CASE WHEN deaths >= n_risk THEN 1 ELSE 0 END)
             |      OVER (ORDER BY t) AS BIGINT) AS absorbed
             |  FROM c)
             |SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(deaths AS BIGINT) AS deaths,
             |  CASE WHEN absorbed > 0 THEN 0.0
             |    ELSE round(exp(CAST(logs AS DOUBLE)), 6) END AS survival
             |FROM s WHERE deaths > 0 ORDER BY t_days""".stripMargin)),

    // Join-key skew census on the lineitem→supplier FK — the diagnostic
    // that tells you BEFORE a 100 TB join whether it needs salting/AQE
    // skew handling. One groupBy over the key, a 1-row min/max/count
    // census, and a deterministic top-10 head (TakeOrdered, ≤10 rows);
    // shares are exact integer basis points. skew_x_bp = max/avg in bp —
    // the number the salting decision reads.
    QueryDef("profile_skew",
      (s, dir) => {
        val k = Tables.read(s, dir, "lineitem")
          .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
        val t = k.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_cnt"))
        val top10 = k.orderBy(col("c").desc, col("l_suppkey")).limit(10)
          .agg(sum("c").as("s10"))
        t.crossJoin(broadcast(top10))
          .select(col("n_rows"), col("n_keys"), col("max_cnt"),
            expr("max_cnt * 10000 div n_rows").as("top1_bp"),
            expr("s10 * 10000 div n_rows").as("top10_bp"),
            expr("max_cnt * n_keys * 10000 div n_rows").as("skew_x_bp"))
      },
      Some("""WITH k AS (SELECT l_suppkey, count(*) AS c
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT sum(c) AS n_rows, count(*) AS n_keys,
             |    max(c) AS max_cnt FROM k),
             |top10 AS (SELECT sum(c) AS s10 FROM
             |  (SELECT c FROM k ORDER BY c DESC, l_suppkey LIMIT 10))
             |SELECT CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST(max_cnt AS BIGINT) AS max_cnt,
             |  CAST(max_cnt * 10000 // n_rows AS BIGINT) AS top1_bp,
             |  CAST(s10 * 10000 // n_rows AS BIGINT) AS top10_bp,
             |  CAST(max_cnt * n_keys * 10000 // n_rows AS BIGINT)
             |    AS skew_x_bp
             |FROM t CROSS JOIN top10""".stripMargin)),

    // Theil T inequality index over order values, decomposed between/
    // within customer regions — the additive inequality decomposition
    // (gini can't decompose; Theil can). Group sums are exact
    // DECIMAL(18,2) (order-independent), so every mean is one identical
    // double division in both engines; per-row entropy terms round to
    // 12 dp and decimal-sum before the final 6-dp rounding; the within
    // component is the exact raw difference (total − between), computed
    // before any 6-dp rounding so the decomposition identity holds.
    QueryDef("agg_theil",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select("o_custkey", "o_totalprice")
        val c = Tables.read(s, dir, "customer")
          .select("c_custkey", "c_nationkey")
        val n = Tables.read(s, dir, "nation")
          .select("n_nationkey", "n_regionkey")
        val r = Tables.read(s, dir, "region")
          .select("r_regionkey", "r_name")
        val x = o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name"), col("o_totalprice").as("x"))
        val tot = x.agg(
          sum(col("x").cast("decimal(18,2)")).as("sx"),
          count(lit(1)).as("n"))
        val mu = col("sx").cast("double") / col("n")
        val totalRaw = x.crossJoin(broadcast(tot))
          .select(round((col("x") / mu) * log(col("x") / mu), 12)
            .cast("decimal(28,12)").as("term"),
            col("n"), col("sx"))
          .groupBy("n", "sx")
          .agg((sum("term").cast("double") / col("n")).as("t_total_raw"))
        val grp = x.groupBy("r_name").agg(
          sum(col("x").cast("decimal(18,2)")).as("sxg"),
          count(lit(1)).as("ng"))
        val mug = col("sxg").cast("double") / col("ng")
        val betweenRaw = grp.crossJoin(broadcast(tot))
          .select(round(
            (col("sxg").cast("double") / col("sx").cast("double")) *
              log(mug / mu), 12).cast("decimal(28,12)").as("bterm"))
          .agg(sum("bterm").cast("double").as("t_between_raw"))
        totalRaw.crossJoin(broadcast(betweenRaw))
          .select(col("n").as("n_orders"),
            round(col("t_total_raw"), 6).as("theil_total"),
            round(col("t_between_raw"), 6).as("theil_between"),
            round(col("t_total_raw") - col("t_between_raw"), 6)
              .as("theil_within"))
      },
      Some("""WITH x AS (SELECT r.r_name, o.o_totalprice AS x
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey),
             |tot AS (SELECT sum(CAST(x AS DECIMAL(18,2))) AS sx,
             |    count(*) AS n FROM x),
             |tr AS (SELECT max(n) AS n,
             |    CAST(sum(CAST(round((x / (CAST(sx AS DOUBLE) / n)) *
             |      ln(x / (CAST(sx AS DOUBLE) / n)), 12)
             |      AS DECIMAL(28,12))) AS DOUBLE) / max(n) AS t_total_raw
             |  FROM x CROSS JOIN tot),
             |g AS (SELECT r_name, sum(CAST(x AS DECIMAL(18,2))) AS sxg,
             |    count(*) AS ng FROM x GROUP BY 1),
             |br AS (SELECT CAST(sum(CAST(round(
             |      (CAST(sxg AS DOUBLE) / CAST(sx AS DOUBLE)) *
             |      ln((CAST(sxg AS DOUBLE) / ng) /
             |         (CAST(sx AS DOUBLE) / n)), 12)
             |      AS DECIMAL(28,12))) AS DOUBLE) AS t_between_raw
             |  FROM g CROSS JOIN tot)
             |SELECT CAST(n AS BIGINT) AS n_orders,
             |  round(t_total_raw, 6) AS theil_total,
             |  round(t_between_raw, 6) AS theil_between,
             |  round(t_total_raw - t_between_raw, 6) AS theil_within
             |FROM tr CROSS JOIN br""".stripMargin)),

    // Mann-Kendall trend test per event-type daily series (the
    // significance companion to ts_theil_sen's slope, same
    // days-domain-bounded pairwise frame): S = Σ sign(y_j − y_i) over
    // time-ordered pairs — EXACT integers since y is a count — with the
    // tie-corrected variance n(n−1)(2n+5) − Σ t(t−1)(2t+5) (kept ×18 as
    // an exact integer) and the continuity-corrected z. Pairs grow with
    // the DATE RANGE (≤ |days|²/2), never with the corpus.
    QueryDef("ts_mann_kendall",
      (s, dir) => {
        val daily = Tables.read(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            when(col("b.y") > col("a.y"), 1L)
              .when(col("b.y") < col("a.y"), -1L).otherwise(0L).as("sg"))
        val sStat = pairs.groupBy("event_type")
          .agg(sum("sg").as("s_stat"))
        val nDays = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"))
        val ties = daily.groupBy("event_type", "y")
          .agg(count(lit(1)).as("tt"))
          .filter(col("tt") > 1)
          .groupBy("event_type")
          .agg(sum(expr("tt * (tt - 1) * (2 * tt + 5)")).as("tie18"))
        val z = col("s_stat").cast("double")
        sStat.join(nDays, "event_type")
          .join(ties, Seq("event_type"), "left")
          .withColumn("var18",
            expr("n_days * (n_days - 1) * (2 * n_days + 5)") -
              coalesce(col("tie18"), lit(0L)))
          .select(col("event_type"), col("n_days"), col("s_stat"),
            col("var18"),
            round(
              when(col("s_stat") > 0,
                (z - 1.0) / sqrt(col("var18") / 18.0))
                .when(col("s_stat") < 0,
                  (z + 1.0) / sqrt(col("var18") / 18.0))
                .otherwise(0.0), 6).as("z_score"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |pairs AS (SELECT a.event_type,
             |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
             |      ELSE 0 END AS sg
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day < b.day),
             |s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
             |  FROM pairs GROUP BY 1),
             |nd AS (SELECT event_type, count(*) AS n_days
             |  FROM daily GROUP BY 1),
             |ties AS (SELECT event_type,
             |    CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie18
             |  FROM (SELECT event_type, y, count(*) AS tt FROM daily
             |        GROUP BY 1, 2) WHERE tt > 1 GROUP BY 1),
             |v AS (SELECT s.event_type, nd.n_days, s.s_stat,
             |    nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
             |      - coalesce(ties.tie18, 0) AS var18
             |  FROM s JOIN nd USING (event_type)
             |  LEFT JOIN ties USING (event_type))
             |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(s_stat AS BIGINT) AS s_stat,
             |  CAST(var18 AS BIGINT) AS var18,
             |  round(CASE
             |    WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
             |      / sqrt(var18 / 18.0)
             |    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
             |      / sqrt(var18 / 18.0)
             |    ELSE 0.0 END, 6) AS z_score
             |FROM v ORDER BY event_type""".stripMargin)),

    // Sentence-level structure census per source: split on [.!?]+ runs,
    // count whitespace-delimited words per sentence — the text-curation
    // signal one level below the document quality score (burstiness of
    // sentence length separates prose from listings/boilerplate). Pure
    // map-side explode + one groupBy(|sources|); words use an explicit
    // [ \t\n\r] class so the Java and RE2 regex engines agree, and both
    // engines filter empty split artifacts identically. avg is exact
    // centi-words (total*100 div n).
    QueryDef("text_sentence_stats",
      (s, dir) => {
        val sent = Tables.read(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), "[.!?]+")).as("raw"))
          .select(col("source"), trim(col("raw")).as("sent"))
          .filter(length(col("sent")) > 0)
        sent
          .withColumn("words",
            size(org.apache.spark.sql.functions.filter(
              split(col("sent"), "[ \\t\\n\\r]+"),
              x => length(x) > 0)).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_sentences"),
            sum("words").as("total_words"),
            expr("sum(words) * 100 div count(*)").as("avg_words_c"),
            max("words").as("max_words"))
          .orderBy("source")
      },
      Some("""WITH raw AS (SELECT source,
             |    unnest(regexp_split_to_array(text, '[.!?]+')) AS piece
             |  FROM documents),
             |sent AS (SELECT source, trim(piece) AS sent FROM raw
             |  WHERE length(trim(piece)) > 0),
             |w AS (SELECT source,
             |    CAST(len(list_filter(
             |      regexp_split_to_array(sent, '[ \t\n\r]+'),
             |      x -> length(x) > 0)) AS BIGINT) AS words
             |  FROM sent)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_sentences,
             |  CAST(sum(words) AS BIGINT) AS total_words,
             |  CAST(sum(words) * 100 // count(*) AS BIGINT) AS avg_words_c,
             |  CAST(max(words) AS BIGINT) AS max_words
             |FROM w GROUP BY source ORDER BY source""".stripMargin)),

    // Laplace-MECHANISM-SHAPED census release — NOT an ε-DP guarantee.
    // The noise is Laplace(1/ε) via the inverse CDF over a DETERMINISTIC
    // per-group uniform (the 63-bit md5 hash of the group key, scaled
    // from its low 52 bits — both engines derive the identical double, so
    // the mechanism itself is oracle-gated like everything else). That
    // determinism is exactly what voids the privacy property: the salt
    // is a public literal (the noise is invertible by anyone today), and
    // even with a secret seed, identical noise on every release means no
    // fresh randomness, so the ε-composition guarantee over repeated
    // releases is void. Treat this as a demo of the mechanism's PLUMBING
    // (sensitivity-1 counts, inverse-CDF transform, noisy-census-only
    // output — the true counts never leave the query); a real DP release
    // draws fresh secret randomness per release and accounts ε across
    // releases. ε = 1, sensitivity 1 (one document changes one count by
    // one).
    QueryDef("curation_dp_counts",
      (s, dir) => {
        val eps = 1.0
        val g = Tables.read(s, dir, "documents")
          .groupBy("lang").agg(count(lit(1)).as("n"))
        val u = pmod(GraftFunctions.hash64(
            concat(lit("dp|"), col("lang"))), lit(4503599627370496L))
          .cast("double") / lit(4503599627370496.0)
        val v = u - lit(0.5)
        val noise = (lit(-1.0) / eps) *
          when(v >= 0, lit(1.0)).otherwise(lit(-1.0)) *
          log(lit(1.0) - lit(2.0) * abs(v))
        g.select(col("lang"),
            round(col("n") + noise, 4).as("noisy_count"),
            lit(eps).as("epsilon"))
          .orderBy("lang")
      },
      Some(s"""WITH g AS (SELECT lang, count(*) AS n FROM documents
              |  GROUP BY 1),
              |u AS (SELECT lang, n,
              |    CAST(${Sql.hash64("'dp|' || lang")} % 4503599627370496
              |      AS DOUBLE) / 4503599627370496.0 AS u01
              |  FROM g)
              |SELECT lang,
              |  round(n + (-1.0 / 1.0) *
              |    (CASE WHEN u01 - 0.5 >= 0 THEN 1.0 ELSE -1.0 END) *
              |    ln(1.0 - 2.0 * abs(u01 - 0.5)), 4) AS noisy_count,
              |  CAST(1.0 AS DOUBLE) AS epsilon
              |FROM u ORDER BY lang""".stripMargin)),

    // Zipf-law fit over the top-100 vocabulary: least-squares slope of
    // ln(tf) on ln(rank) — the corpus-health diagnostic (natural prose
    // sits near −1; generated/boilerplate corpora drift). The rank window
    // is a 100-row post-TakeOrdered head; the regression sums are 12-dp
    // rounded + decimal-summed so both engines agree at 6 dp.
    QueryDef("text_zipf_fit",
      (s, dir) => {
        val top = graft.ops.TextOps.withTokens(
            Tables.read(s, dir, "documents"))
          .select(explode(col("t")).as("token"))
          .filter(length(col("token")) >= 2)
          .groupBy("token").agg(count(lit(1)).as("tf"))
          .orderBy(desc("tf"), col("token"))
          .limit(100)
        val xy = top
          .withColumn("r", row_number()
            .over(Window.orderBy(desc("tf"), col("token"))).cast("long"))
          .select(round(log(col("r").cast("double")), 12)
              .cast("decimal(28,12)").as("x"),
            round(log(col("tf").cast("double")), 12)
              .cast("decimal(28,12)").as("y"),
            round(log(col("r").cast("double")) *
              log(col("tf").cast("double")), 12)
              .cast("decimal(28,12)").as("xy"),
            round(log(col("r").cast("double")) *
              log(col("r").cast("double")), 12)
              .cast("decimal(28,12)").as("xx"))
        xy.agg(count(lit(1)).as("n_terms"),
            sum("x").cast("double").as("sx"),
            sum("y").cast("double").as("sy"),
            sum("xy").cast("double").as("sxy"),
            sum("xx").cast("double").as("sxx"))
          .select(col("n_terms"),
            round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
              (col("n_terms") * col("sxx") - col("sx") * col("sx")), 6)
              .as("zipf_slope"),
            round((col("sy") - (col("n_terms") * col("sxy") -
              col("sx") * col("sy")) /
              (col("n_terms") * col("sxx") - col("sx") * col("sx")) *
              col("sx")) / col("n_terms"), 6).as("intercept"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(lower(trim(text)),
             |    '\s+')) AS token
             |  FROM documents),
             |top AS (SELECT token, count(*) AS tf FROM toks
             |  WHERE length(token) >= 2
             |  GROUP BY token ORDER BY tf DESC, token LIMIT 100),
             |rk AS (SELECT tf, CAST(row_number() OVER
             |    (ORDER BY tf DESC, token) AS BIGINT) AS r FROM top),
             |xy AS (SELECT
             |    CAST(round(ln(CAST(r AS DOUBLE)), 12)
             |      AS DECIMAL(28,12)) AS x,
             |    CAST(round(ln(CAST(tf AS DOUBLE)), 12)
             |      AS DECIMAL(28,12)) AS y,
             |    CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(tf AS DOUBLE)),
             |      12) AS DECIMAL(28,12)) AS xy,
             |    CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)),
             |      12) AS DECIMAL(28,12)) AS xx
             |  FROM rk),
             |a AS (SELECT count(*) AS n_terms,
             |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             |    CAST(sum(xy) AS DOUBLE) AS sxy,
             |    CAST(sum(xx) AS DOUBLE) AS sxx
             |  FROM xy)
             |SELECT n_terms,
             |  round((n_terms * sxy - sx * sy) /
             |    (n_terms * sxx - sx * sx), 6) AS zipf_slope,
             |  round((sy - (n_terms * sxy - sx * sy) /
             |    (n_terms * sxx - sx * sx) * sx) / n_terms, 6) AS intercept
             |FROM a""".stripMargin))
  )
}
