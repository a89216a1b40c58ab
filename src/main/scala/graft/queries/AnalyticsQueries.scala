package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Analytical surface beyond the reference (SURVEY §2.4-2.5 "not present"
  * rows): the query shapes the star schema exists to serve — distinct
  * counts, rollup with grouping indicators, semi/anti joins, pivot,
  * JSON extraction.
  */
object AnalyticsQueries {

  val all: Seq[QueryDef] = Seq(

    // Market-basket association rules over co-ordered parts: support,
    // confidence and lift in ppm fixed-point. Pairs explode MAP-SIDE from
    // each order's sorted distinct part set (the common-neighbors /
    // triangles idiom — Σ C(basket,2) with baskets ~4, never a
    // theta-join), capped at each basket's 256 smallest parts
    // (Graph.cappedNeighborPairs): TPC-H baskets never get near the cap,
    // but the operator is sold as general, and one adversarial
    // 100k-item basket would otherwise materialize C(100k,2) structs in
    // a single task.
    //
    // Round-7 re-plan (the 25.3× shuffle-byte row): the top-25 order key
    // is n_ab ALONE, which the per-part count joins don't touch — so the
    // top-k (TakeOrderedAndProject, no sort shuffle) runs FIRST and the
    // n_a/n_b lookups join 25 broadcast rows against the count frame
    // instead of shuffling the full pair frame twice. The pair itself
    // rides one BIGINT (s_a<<32 | s_b — valid while part keys < 2³¹;
    // decoded after the limit), narrowing the one remaining data-sized
    // exchange, and ordering by the encoded key ≡ ordering by (p_a,p_b).
    // Baskets build straight from groupBy(ord)+collect_set (dedups on its
    // own — the old separate distinct() was a second full shuffle), and
    // ntot/per-part counts reuse the baskets exchange (ReuseExchange)
    // rather than re-shuffling the scan. The order total rides a
    // broadcast 1-row frame. Lift's numerator (n_ab·N·1e6) is
    // DECIMAL(38,0) — int64 wraps once n·N passes ~9e12, i.e. well
    // inside 100 TB row counts.
    QueryDef("agg_market_basket",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_orderkey").as("ord"),
            col("l_partkey").cast("long").as("part"))
        // Lazy checkpoint: baskets feeds FOUR consumers (ntot, both count
        // joins, the pair explode) split across broadcast-build subtrees,
        // where exchange reuse does NOT apply — un-pinned, the scan +
        // collect_set exchange ran 4× (measured 4.3× wall at sf1). One
        // cached materialization, every consumer reads it.
        val baskets = li.groupBy("ord")
          .agg(sort_array(collect_set(col("part"))).as("parts"))
          .localCheckpoint(false)
        val ntot = baskets.agg(count(lit(1)).as("ntot"))
        val c = baskets.select(explode(col("parts")).as("part"))
          .groupBy("part").agg(count(lit(1)).as("n"))
          .localCheckpoint(false)
        val top = graft.ops.Graph.cappedNeighborPairs(baskets, "parts", 256)
          .select(graft.ops.Graph.packPair(col("s_a"), col("s_b")).as("pp"))
          .groupBy("pp").agg(count(lit(1)).as("n_ab"))
          .orderBy(desc("n_ab"), col("pp"))
          .limit(25)
          .select(expr("shiftright(pp, 32)").as("p_a"),
            expr("pp & 4294967295").as("p_b"), col("n_ab"))
        // No explicit broadcast on the 25-row side: a forced hint wraps
        // the whole top-k pipeline in a broadcast-BUILD subtree, which
        // de-parallelizes its materialization (measured 14.2 s vs 3.3 s
        // warm at sf1). AQE sees the 25-row runtime stat after the limit
        // stage and converts both count joins to broadcast on its own.
        c.select(col("part").as("p_a"), col("n").as("n_a"))
          .join(top, Seq("p_a"))
          .join(c.select(col("part").as("p_b"), col("n").as("n_b")),
            Seq("p_b"))
          .crossJoin(broadcast(ntot))
          .select(col("p_a"), col("p_b"), col("n_ab"),
            expr("n_ab * 1000000L div ntot").as("support_ppm"),
            expr("n_ab * 1000000L div n_a").as("conf_ppm"),
            expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * ntot * 1000000)
                   |  div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
              .stripMargin).as("lift_ppm"))
          .orderBy(desc("n_ab"), col("p_a"), col("p_b"))
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS ord,
             |    CAST(l_partkey AS BIGINT) AS part FROM lineitem),
             |n AS (SELECT count(DISTINCT ord) AS ntot FROM op),
             |c AS (SELECT part, count(*) AS n FROM op GROUP BY 1),
             |capped AS (SELECT ord, part FROM (
             |    SELECT ord, part, row_number() OVER (
             |      PARTITION BY ord ORDER BY part) AS rn FROM op)
             |  WHERE rn <= 256),
             |p AS (SELECT a.part AS p_a, b.part AS p_b, count(*) AS n_ab
             |      FROM capped a JOIN capped b
             |      ON a.ord = b.ord AND a.part < b.part
             |      GROUP BY 1, 2)
             |SELECT p_a, p_b, n_ab,
             |  CAST(n_ab * 1000000 // ntot AS BIGINT) AS support_ppm,
             |  CAST(n_ab * 1000000 // ca.n AS BIGINT) AS conf_ppm,
             |  CAST((CAST(n_ab AS HUGEINT) * ntot * 1000000)
             |    // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT) AS lift_ppm
             |FROM p JOIN c ca ON ca.part = p.p_a
             |  JOIN c cb ON cb.part = p.p_b CROSS JOIN n
             |ORDER BY n_ab DESC, p_a, p_b LIMIT 25""".stripMargin)),

    // exact distinct counts per region (shuffle-on-key + distinct agg)
    QueryDef("agg_distinct_counts",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
        val c = Tables.read(s, dir, "customer")
        val n = Tables.read(s, dir, "nation")
        val r = Tables.read(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(countDistinct(col("c_custkey")).as("n_customers"),
            countDistinct(col("o_orderpriority")).as("n_priorities"),
            count(lit(1)).as("n_orders"))
          .orderBy("r_name")
      },
      Some("""SELECT r.r_name, COUNT(DISTINCT c.c_custkey) AS n_customers,
             |COUNT(DISTINCT o.o_orderpriority) AS n_priorities,
             |count(*) AS n_orders
             |FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)),

    // Approximate sketches: the estimate itself is engine-specific, so the
    // query emits the exact value + a boolean "estimate inside its error
    // bound" verdict, and the oracle asserts the verdict is uniformly true
    // — the bound claim is hash-checked, not just spec'd.
    QueryDef("sketch_distinct",
      (s, dir) => graft.ops.Sketches.approxDistinct(
        Tables.read(s, dir, "events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
             |TRUE AS within_bound
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // audience overlap of two segments via mergeable sketches: exact
    // union/intersection/difference hash-matched, inclusion-exclusion
    // estimate verdicts proven uniformly true (compound error bound)
    QueryDef("sketch_set_ops",
      (s, dir) => graft.ops.Sketches.setOps(
        Tables.read(s, dir, "events"), "click", "purchase"),
      Some("""WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
             |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
             |SELECT (SELECT count(*) FROM u) AS exact_union,
             |(SELECT count(*) FROM a) + (SELECT count(*) FROM b)
             |  - (SELECT count(*) FROM u) AS exact_intersect,
             |(SELECT count(*) FROM u) - (SELECT count(*) FROM b) AS exact_only_a,
             |TRUE AS union_ok, TRUE AS intersect_ok""".stripMargin)),

    QueryDef("sketch_quantile",
      (s, dir) => graft.ops.Sketches.approxQuantiles(
        Tables.read(s, dir, "events")),
      Some("""SELECT event_type, TRUE AS within_p50, TRUE AS within_p90
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("sketch_hll_merge",
      (s, dir) => graft.ops.Sketches.hllMerge(
        Tables.read(s, dir, "events")),
      Some("""SELECT count(DISTINCT user_id) AS exact_distinct,
             |TRUE AS merge_consistent, TRUE AS within_bound
             |FROM events""".stripMargin)),

    // hierarchical rollup with grouping indicators
    // explicit GROUPING SETS (the general form behind rollup/cube): a
    // custom lattice of (status, priority) / (priority) / () — one pass,
    // partial-aggregated per set, no union of separate scans
    QueryDef("agg_grouping_sets",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
        o.groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderpriority")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_price"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_priority"))
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority"), col("g_status"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
             |CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
             |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |  (o_orderpriority), ())
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
             |  g_status""".stripMargin)),

    QueryDef("agg_rollup",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
        o.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_price"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_priority"))
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
             |CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // full grouping-sets lattice (CUBE) with grouping indicators
    QueryDef("agg_cube",
      (s, dir) => Tables.read(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             |CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // set operations: INTERSECT / EXCEPT (set semantics, deduped)
    QueryDef("set_ops",
      (s, dir) => {
        val building = Tables.read(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val withOrders = Tables.read(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey"))
        building.intersect(withOrders)
          .withColumn("kind", lit("building_with_orders"))
          .unionByName(building.except(withOrders)
            .withColumn("kind", lit("building_without_orders")))
          .orderBy("c_custkey", "kind")
      },
      Some("""SELECT c_custkey, kind FROM (
             |  SELECT c_custkey, 'building_with_orders' AS kind FROM (
             |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |    INTERSECT SELECT o_custkey FROM orders)
             |  UNION ALL
             |  SELECT c_custkey, 'building_without_orders' FROM (
             |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |    EXCEPT SELECT o_custkey FROM orders))
             |ORDER BY c_custkey, kind""".stripMargin)),

    // left-semi (EXISTS) and left-anti (NOT EXISTS) in one labeled union
    QueryDef("join_semi_anti",
      (s, dir) => {
        val c = Tables.read(s, dir, "customer").select("c_custkey")
        val o = Tables.read(s, dir, "orders").select("o_custkey")
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .withColumn("kind", lit("has_orders"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .withColumn("kind", lit("no_orders"))
        semi.unionByName(anti).orderBy("c_custkey", "kind")
      },
      Some("""SELECT c_custkey, 'has_orders' AS kind FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |UNION ALL
             |SELECT c_custkey, 'no_orders' FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey, kind""".stripMargin)),

    // Bloom semi-join reduction: lineitem is pruned map-side (codegen'd
    // graft_bloom_contains at the scan) before the sort-merge shuffle, so
    // the exchange moves only rows whose supplier survives the selective
    // nation filter. Exact join afterwards removes bloom false positives —
    // the result is exactly the plain 3-way join the oracle runs.
    QueryDef("join_bloom_prune",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_suppkey").as("s_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)").as("rev"))
        val nat = Tables.read(s, dir, "nation")
          .filter(col("n_name") === "NATION_7").select("n_nationkey")
        val dim = Tables.read(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")
        graft.core.BloomJoinOps.prunedJoin(li, dim, "s_suppkey")
          .groupBy("s_name")
          .agg(sum(col("rev")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name,
             |CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |count(*) AS n_items
             |FROM lineitem, supplier, nation
             |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |  AND n_name = 'NATION_7'
             |GROUP BY s_name ORDER BY s_name""".stripMargin)),

    // pivot: order counts per priority × status
    QueryDef("pivot_status",
      (s, dir) => Tables.read(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             |count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             |count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // group-wise top-k via the custom TypedImperativeAggregate (bounded
    // per-partition heaps + partial merge — no per-group sort; see
    // core/TopKBy.scala). Oracle: the equivalent window row_number form.
    QueryDef("topk_per_group",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
        val sup = Tables.read(s, dir, "supplier")
        val n = Tables.read(s, dir, "nation")
        val rev = li.groupBy("l_suppkey")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
        rev.join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(call_function("graft_top_k_by",
            col("revenue"), col("s_suppkey"), lit(3)).as("topk"))
          .select(col("n_name"), posexplode(col("topk")))
          .select(col("n_name"), (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("s_suppkey"), col("col.value").as("revenue"))
          .orderBy("n_name", "rank")
      },
      Some("""SELECT n_name, CAST(rank AS BIGINT) AS rank, s_suppkey, revenue
             |FROM (
             |  SELECT n.n_name, s.s_suppkey,
             |    CAST(rev.revenue AS DOUBLE) AS revenue,
             |    row_number() OVER (PARTITION BY n.n_name
             |      ORDER BY CAST(rev.revenue AS DOUBLE) DESC, s.s_suppkey) AS rank
             |  FROM (SELECT l_suppkey,
             |          SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue
             |        FROM lineitem GROUP BY l_suppkey) rev
             |  JOIN supplier s ON rev.l_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
             |WHERE rank <= 3 ORDER BY n_name, rank""".stripMargin)),

    // Fuzzy join (entity resolution) by SYMMETRIC-DELETE blocking: two
    // strings within edit distance 1 necessarily share a key in each
    // other's deletion neighborhood (the string itself + every
    // one-char-deleted variant — the SymSpell invariant), so exploding
    // |s|+1 keys per row and hash-joining on the key generates ALL
    // distance-<=1 candidates with zero misses; the exact levenshtein
    // filter then removes same-key false candidates. A naive prefix
    // block degenerates when keys share long prefixes (measured here:
    // every customer shares `Customer#000`, one bucket, 32 s of
    // all-pairs levenshtein at sf0.1 — vs 0.4 s for this shape); the
    // deletion key's bucket size is bounded by how many strings are
    // genuinely 1 edit apart, so shuffle tracks the TRUE match density
    // at 100 TB, not the corpus size. Probes are derived
    // deterministically from the table (every 19th customer, last char
    // replaced) so the demo needs no side fixture.
    QueryDef("join_fuzzy",
      (s, dir) => {
        def delKeys(c: Column): Column = array_distinct(concat(
          array(c),
          transform(sequence(lit(1), length(c)),
            i => concat(c.substr(lit(1), i - 1),
              c.substr(i + 1, length(c))))))
        val cust = Tables.read(s, dir, "customer")
          .select("c_custkey", "c_name")
        val probes = cust.filter(pmod(col("c_custkey"), lit(19)) === 0)
          .select(col("c_custkey").as("probe_id"),
            concat(expr("substring(c_name, 1, length(c_name) - 1)"),
              lit("X")).as("probe_name"))
        val pk = probes.select(col("probe_id"), col("probe_name"),
          explode(delKeys(col("probe_name"))).as("k"))
        val ck = cust.select(col("c_custkey"), col("c_name"),
          explode(delKeys(col("c_name"))).as("k"))
        pk.join(ck, "k")
          .select("probe_id", "probe_name", "c_custkey", "c_name")
          .distinct()
          // THRESHOLDED levenshtein: banded DP that abandons a pair the
          // moment the distance must exceed 1 (returns -1) — O(k·n) per
          // comparison instead of the full O(n·m) matrix, the verify-stage
          // cost that matters when candidates number in the billions
          .withColumn("edit_dist",
            levenshtein(col("probe_name"), col("c_name"), 1).cast("long"))
          .filter(col("edit_dist") >= 0)
          .select(col("probe_id"), col("probe_name"),
            col("c_custkey"), col("c_name"), col("edit_dist"))
          .orderBy("probe_id", "c_custkey")
      },
      Some("""WITH probes AS (
             |  SELECT c_custkey AS probe_id,
             |    substring(c_name, 1, length(c_name) - 1) || 'X' AS probe_name
             |  FROM customer WHERE c_custkey % 19 = 0),
             |pk AS (SELECT probe_id, probe_name,
             |  unnest(list_distinct(list_append(
             |    [substr(probe_name, 1, i - 1) ||
             |     substr(probe_name, i + 1, length(probe_name))
             |     for i in generate_series(1, length(probe_name))],
             |    probe_name))) AS k FROM probes),
             |ck AS (SELECT c_custkey, c_name,
             |  unnest(list_distinct(list_append(
             |    [substr(c_name, 1, i - 1) ||
             |     substr(c_name, i + 1, length(c_name))
             |     for i in generate_series(1, length(c_name))],
             |    c_name))) AS k FROM customer),
             |cand AS (SELECT DISTINCT probe_id, probe_name, c_custkey, c_name
             |  FROM pk JOIN ck USING (k))
             |SELECT probe_id, probe_name, c_custkey, c_name,
             |  CAST(levenshtein(probe_name, c_name) AS BIGINT) AS edit_dist
             |FROM cand WHERE levenshtein(probe_name, c_name) <= 1
             |ORDER BY probe_id, c_custkey""".stripMargin)),

    // Jaro-Winkler-scored linkage over the SAME SymSpell deletion-key
    // candidates as join_fuzzy — the graded-similarity face of entity
    // resolution (edit distance is a hard gate; survey-statistics linkage
    // ranks candidates by JW and thresholds at ~0.9). The scorer is a
    // native codegen'd BinaryExpression (core/StringSim.scala): at 100 TB
    // the verify stage runs over every candidate pair, so it must stay
    // inside whole-stage codegen — a UDF boundary here would dominate the
    // join. Semantics pinned to DuckDB's jaro_winkler_similarity (match
    // window, transposition halving, prefix boost only past jaro 0.7 —
    // probed + spec-gated), both engines rounding to 6 dp before the
    // threshold so the keep decision is engine-exact.
    QueryDef("join_linkage_jw",
      (s, dir) => {
        def delKeys(c: Column): Column = array_distinct(concat(
          array(c),
          transform(sequence(lit(1), length(c)),
            i => concat(c.substr(lit(1), i - 1),
              c.substr(i + 1, length(c))))))
        val cust = Tables.read(s, dir, "customer")
          .select("c_custkey", "c_name")
        val probes = cust.filter(pmod(col("c_custkey"), lit(19)) === 0)
          .select(col("c_custkey").as("probe_id"),
            concat(expr("substring(c_name, 1, length(c_name) - 1)"),
              lit("X")).as("probe_name"))
        val pk = probes.select(col("probe_id"), col("probe_name"),
          explode(delKeys(col("probe_name"))).as("k"))
        val ck = cust.select(col("c_custkey"), col("c_name"),
          explode(delKeys(col("c_name"))).as("k"))
        pk.join(ck, "k")
          .select("probe_id", "probe_name", "c_custkey", "c_name")
          .distinct()
          .withColumn("jw", round(call_function("graft_jaro_winkler",
            col("probe_name"), col("c_name")), 6))
          .filter(col("jw") >= 0.9)
          .select("probe_id", "c_custkey", "jw")
          .orderBy("probe_id", "c_custkey")
      },
      Some("""WITH probes AS (
             |  SELECT c_custkey AS probe_id,
             |    substring(c_name, 1, length(c_name) - 1) || 'X' AS probe_name
             |  FROM customer WHERE c_custkey % 19 = 0),
             |pk AS (SELECT probe_id, probe_name,
             |  unnest(list_distinct(list_append(
             |    [substr(probe_name, 1, i - 1) ||
             |     substr(probe_name, i + 1, length(probe_name))
             |     for i in generate_series(1, length(probe_name))],
             |    probe_name))) AS k FROM probes),
             |ck AS (SELECT c_custkey, c_name,
             |  unnest(list_distinct(list_append(
             |    [substr(c_name, 1, i - 1) ||
             |     substr(c_name, i + 1, length(c_name))
             |     for i in generate_series(1, length(c_name))],
             |    c_name))) AS k FROM customer),
             |cand AS (SELECT DISTINCT probe_id, probe_name, c_custkey, c_name
             |  FROM pk JOIN ck USING (k))
             |SELECT probe_id, c_custkey,
             |  round(jaro_winkler_similarity(probe_name, c_name), 6) AS jw
             |FROM cand
             |WHERE round(jaro_winkler_similarity(probe_name, c_name), 6) >= 0.9
             |ORDER BY probe_id, c_custkey""".stripMargin)),

    // JSON extraction from the props column
    QueryDef("fn_json_extract",
      (s, dir) => Tables.read(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_long"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |json_extract_string(props, '$.k') AS k_str,
             |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long
             |FROM events ORDER BY event_id""".stripMargin)),

    // SKYLINE (Pareto frontier): parts not dominated on (minimize
    // p_retailprice, maximize p_size) — see ops/Skyline.scala for the
    // two-phase plan. The DuckDB oracle stays algorithm-independent
    // (explicit NOT EXISTS dominance against the per-size representative
    // frame, not a mirrored sweep).
    QueryDef("agg_skyline",
      (s, dir) => graft.ops.Skyline.paretoFront(
          Tables.read(s, dir, "part")
            .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
          "p_size", "p_retailprice",
          Seq("p_partkey", "p_size", "p_retailprice"))
        .orderBy("p_partkey"),
      Some("""WITH s AS (SELECT p_size, min(p_retailprice) AS minp
             |          FROM part GROUP BY 1)
             |SELECT p.p_partkey, p.p_size, p.p_retailprice
             |FROM part p
             |WHERE NOT EXISTS (SELECT 1 FROM s b
             |  WHERE b.p_size >= p.p_size AND b.minp <= p.p_retailprice
             |    AND (b.p_size > p.p_size OR b.minp < p.p_retailprice))
             |ORDER BY p.p_partkey""".stripMargin)),

    // EXACT order statistics without collecting: the p25/p50/p75/p100
    // user by total spend, found by exact global rank — the NATIVE
    // distributed row_number operator (plans/GlobalRank: range exchange
    // + shuffle-read count pass), then a 4-row broadcast of the target
    // ranks. percentile_approx trades exactness for one pass; this is
    // the exact complement at one extra metadata-cheap pass, and never
    // a single-partition sort.
    QueryDef("window_exact_quantiles",
      (s, dir) => {
        val u = Tables.read(s, dir, "events").groupBy("user_id")
          .agg(sum(col("value").cast("decimal(20,6)")).cast("double")
            .as("mon"))
        val r = graft.plans.GlobalRank.withRowNumber(u, "rk",
          ("mon", true), ("user_id", true))
        val n = u.agg(count(lit(1)).as("n_tot"))
        val targets = n.select(
            explode(array(lit(25), lit(50), lit(75), lit(100))).as("pct"),
            col("n_tot"))
          .select(col("pct").cast("long").as("pct"),
            greatest(lit(1L), expr("n_tot * pct div 100")).as("target"))
        r.join(broadcast(targets), col("rk") === col("target"))
          .select(col("pct"), col("user_id"), col("mon"))
          .orderBy("pct")
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS mon
             |  FROM events GROUP BY user_id),
             |r AS (SELECT user_id, mon,
             |    row_number() OVER (ORDER BY mon, user_id) AS rk FROM u),
             |n AS (SELECT count(*) AS n_tot FROM u),
             |t AS (SELECT pct, greatest(1, n_tot * pct // 100) AS target
             |  FROM n, (VALUES (25), (50), (75), (100)) v(pct))
             |SELECT CAST(pct AS BIGINT) AS pct, user_id, mon
             |FROM t JOIN r ON rk = target ORDER BY pct""".stripMargin)),

    // GLOBAL tie-aware leaderboard (round-13): every order's competition
    // rank AND dense band index by $100 price band, via the native
    // GlobalRank operator's rank/dense_rank modes — the tie-heavy global
    // ranking that `rank() OVER (ORDER BY …)` would plan as ONE task
    // holding the whole table. Bands are exact integers (decimal cents
    // div 10000 — no float rounding to disagree on), so tie groups are
    // identical cross-engine; boundary ties span range partitions by
    // construction, exercising the operator's driver-side fixups on real
    // data. Plan: one range exchange + one shuffle-read summary pass per
    // mode; no WindowExec, no single-partition sort.
    QueryDef("window_global_rank",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT) div 10000").as("price_band"))
        val r = graft.plans.GlobalRank.withRank(o, "rk",
          ("price_band", false))
        graft.plans.GlobalRank.withDenseRank(r, "band_idx",
            ("price_band", false))
          .select(col("o_orderkey"), col("price_band"), col("rk"),
            col("band_idx"))
          .orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // 10000 AS price_band
             |  FROM orders)
             |SELECT o_orderkey, price_band,
             |  rank() OVER (ORDER BY price_band DESC) AS rk,
             |  dense_rank() OVER (ORDER BY price_band DESC) AS band_idx
             |FROM b ORDER BY o_orderkey""".stripMargin)),

    // GLOBAL running revenue (round-13): every order's cumulative exact
    // cents in date order, through the NATIVE prefix-sum operator
    // (GlobalPrefixSumExec — the scan sibling of GlobalRank: one range
    // exchange + a shuffle-read sum pass, no single-task window). This
    // is the cumulative-anything shape (Lorenz curves, CDFs, budget
    // burndown) that `sum() OVER (ORDER BY …)` would serialize onto one
    // task. ROWS-frame on a total order, so ties are impossible and both
    // engines agree bit-for-bit on exact integers.
    QueryDef("window_running_total",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT)").as("cents"))
        graft.plans.GlobalRank.withRunningSum(o, "run_cents", "cents",
            ("o_orderdate", true), ("o_orderkey", true))
          .select(col("o_orderkey"), col("cents"), col("run_cents"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |    AS cents,
             |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT))
             |    OVER (ORDER BY o_orderdate, o_orderkey
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS run_cents
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // EXACT weighted quantiles (round-13): the revenue-weighted p25/50/75
    // of line-item quantity — "at what quantity does a quarter of the
    // money sit?" — via the native prefix sum: running weight in exact
    // cents on a total order, the answer at each pct is the least
    // quantity whose cumulative weight covers pct% of the total
    // (cum·100 ≥ W·pct, all exact integers; monotone, so a min-agg finds
    // the crossing row without a second pass). percentile_approx can't
    // do weights; a single-task window couldn't do 100 TB.
    QueryDef("agg_weighted_quantiles",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("q"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT)").as("w"))
        val run = graft.plans.GlobalRank.withRunningSum(li, "cum_w", "w",
          ("q", true), ("l_orderkey", true), ("l_linenumber", true))
        val tot = li.agg(sum(col("w")).as("w_tot"))
        run.crossJoin(broadcast(tot))
          .select(col("q"), col("cum_w"), col("w_tot"),
            explode(array(lit(25L), lit(50L), lit(75L))).as("pct"))
          .filter(col("cum_w") * 100 >= col("w_tot") * col("pct"))
          .groupBy("pct")
          .agg(min(col("q")).as("weighted_q"), max(col("w_tot")).as("w_tot"))
          .orderBy("pct")
      },
      Some("""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS w,
             |    l_orderkey, l_linenumber
             |  FROM lineitem),
             |r AS (SELECT q, w,
             |    sum(w) OVER (ORDER BY q, l_orderkey, l_linenumber
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum_w
             |  FROM li),
             |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM li),
             |p AS (SELECT unnest([25, 50, 75]) AS pct)
             |SELECT CAST(pct AS BIGINT) AS pct,
             |  CAST(min(q) AS BIGINT) AS weighted_q,
             |  CAST(max(w_tot) AS BIGINT) AS w_tot
             |FROM r CROSS JOIN t CROSS JOIN p
             |WHERE cum_w * 100 >= w_tot * pct
             |GROUP BY pct ORDER BY pct""".stripMargin)),

    // Herfindahl-Hirschman concentration index per nation's supplier
    // market — the standard market-concentration census (antitrust
    // thresholds live at 1500/2500 points; here in basis-point² units,
    // 0..1e8). Revenue is carried as EXACT integer ten-thousandths
    // (decimal-summed then ×1e4 — integer-valued, so the BIGINT cast
    // can't round differently across engines); shares are integral
    // basis points; HHI = Σ share_bp² is an exact integer sum. Plan:
    // one supplier-keyed partial agg over lineitem, dims broadcast,
    // |nations| output rows.
    QueryDef("agg_hhi",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
        val sup = Tables.read(s, dir, "supplier")
        val n = Tables.read(s, dir, "nation")
        val rev = li.groupBy("l_suppkey")
          .agg(expr("CAST(sum(CAST(l_extendedprice * (1 - l_discount)" +
            " AS DECIMAL(18,6))) * 10000 AS BIGINT)").as("rev_tm"))
        val bySupp = rev
          .join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .select(col("n_name"), col("rev_tm"))
        val nat = bySupp.groupBy("n_name")
          .agg(sum(col("rev_tm")).as("nat_tm"),
            count(lit(1)).as("n_suppliers"))
        bySupp.join(broadcast(nat), "n_name")
          .withColumn("share_bp", expr("rev_tm * 10000L div nat_tm"))
          .groupBy("n_name")
          .agg(max(col("n_suppliers")).as("n_suppliers"),
            sum(expr("share_bp * share_bp")).as("hhi_bp2"))
          .orderBy("n_name")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
             |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             |      AS DECIMAL(18,6))) * 10000 AS BIGINT) AS rev_tm
             |  FROM lineitem GROUP BY 1),
             |bs AS (SELECT n.n_name, rev_tm FROM rev
             |  JOIN supplier s ON l_suppkey = s_suppkey
             |  JOIN nation n ON s_nationkey = n_nationkey),
             |nat AS (SELECT n_name, sum(rev_tm) AS nat_tm,
             |    count(*) AS ns FROM bs GROUP BY 1)
             |SELECT b.n_name AS n_name, CAST(ns AS BIGINT) AS n_suppliers,
             |  CAST(sum((rev_tm * 10000 // nat_tm)
             |    * (rev_tm * 10000 // nat_tm)) AS BIGINT) AS hhi_bp2
             |FROM bs b JOIN nat USING (n_name)
             |GROUP BY b.n_name, ns ORDER BY n_name""".stripMargin))
  )
}
