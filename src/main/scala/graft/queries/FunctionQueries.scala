package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Scalar/window/join function surface breadth: lead/lag analytics, full
  * outer join, string/math/array function packs. Transcendental math is
  * rounded to 6 dp (JVM vs C libm may differ in the last ulp); array
  * results are emitted string-joined so engines' array physical types can
  * never skew the compare.
  */
object FunctionQueries {

  val all: Seq[QueryDef] = Seq(

    // lead/lag/first/last over the event-time axis per user
    QueryDef("window_lead_lag",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wAll = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.read(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            lag(col("event_id"), 1).over(w).as("prev_event"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            first(col("event_id")).over(wAll).as("first_event"),
            last(col("event_id")).over(wAll).as("last_event"),
            sum(col("value").cast("decimal(18,6)"))
              .over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double").as("running_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |lag(event_id, 1) OVER w AS prev_event,
             |lead(event_id, 1) OVER w AS next_event,
             |first_value(event_id) OVER
             |  (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
             |last_value(event_id) OVER
             |  (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
             |CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
             |  (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // full outer join: nations vs the set of nations that actually have
    // suppliers — unmatched sides surface as nulls
    QueryDef("join_full_outer",
      (s, dir) => {
        val n = Tables.read(s, dir, "nation").select("n_nationkey", "n_name")
        val sup = Tables.read(s, dir, "supplier")
          .groupBy("s_nationkey").agg(count(lit(1)).as("n_suppliers"))
        n.join(sup, n("n_nationkey") === sup("s_nationkey"), "full_outer")
          .select(col("n_nationkey"), col("n_name"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
          .orderBy(asc_nulls_first("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, coalesce(n_suppliers, 0) AS n_suppliers
             |FROM nation n FULL OUTER JOIN
             |  (SELECT s_nationkey, count(*) AS n_suppliers
             |   FROM supplier GROUP BY s_nationkey) s
             |  ON n.n_nationkey = s.s_nationkey
             |ORDER BY n_nationkey NULLS FIRST""".stripMargin)),

    // string-function pack over part names
    QueryDef("fn_string_funcs",
      (s, dir) => Tables.read(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("up"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          reverse(col("p_type")).as("rev"),
          regexp_replace(col("p_type"), " ", "_").as("snake"),
          substring(col("p_name"), 1, 10).as("head10"),
          length(col("p_name")).cast("long").as("name_len"),
          levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev"),
          concat_ws("/", col("p_brand"), col("p_type")).as("joined"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS up,
             |lpad(p_brand, 12, '*') AS padded,
             |reverse(p_type) AS rev,
             |replace(p_type, ' ', '_') AS snake,
             |substr(p_name, 1, 10) AS head10,
             |CAST(length(p_name) AS BIGINT) AS name_len,
             |CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev,
             |p_brand || '/' || p_type AS joined
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // math-function pack (transcendentals rounded to 6 dp)
    QueryDef("fn_math_funcs",
      (s, dir) => Tables.read(s, dir, "events")
        .select(col("event_id"),
          sqrt(col("value")).as("sq"),
          round(log(col("value") + 1), 6).as("ln1p"),
          round(pow(col("value"), 1.5), 6).as("pow15"),
          abs(col("value") - 100).as("dist100"),
          ceil(col("value")).cast("long").as("cl"),
          floor(col("value")).cast("long").as("fl"),
          pmod(col("event_id"), lit(7)).cast("long").as("mod7"))
        .orderBy("event_id"),
      Some("""SELECT event_id, sqrt(value) AS sq,
             |round(ln(value + 1), 6) AS ln1p,
             |round(pow(value, 1.5), 6) AS pow15,
             |abs(value - 100) AS dist100,
             |CAST(ceil(value) AS BIGINT) AS cl,
             |CAST(floor(value) AS BIGINT) AS fl,
             |CAST(event_id % 7 AS BIGINT) AS mod7
             |FROM events ORDER BY event_id""".stripMargin)),

    // array-function pack over tokenized text (string-joined outputs)
    QueryDef("fn_array_funcs",
      (s, dir) => graft.ops.TextOps.withTokens(Tables.read(s, dir, "documents"))
        .select(col("doc_id"),
          array_join(slice(col("t"), 1, 5), ",").as("head5"),
          array_join(sort_array(slice(col("t"), 1, 5)), ",").as("head5_sorted"),
          array_contains(col("t"), "spark").as("has_spark"),
          size(array_distinct(col("t"))).cast("long").as("n_unique"),
          array_join(array_remove(slice(col("t"), 1, 8), "the"), ",")
            .as("head8_nothe"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |array_to_string(t[1:5], ',') AS head5,
             |array_to_string(list_sort(t[1:5]), ',') AS head5_sorted,
             |list_contains(t, 'spark') AS has_spark,
             |CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
             |array_to_string(list_filter(t[1:8], x -> x <> 'the'), ',') AS head8_nothe
             |FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin))
  )
}
