package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every declared DuckDB oracle: an integer `SUM` (plain or
  * windowed) that reaches the oracle's output uncast comes back as DuckDB
  * HUGEINT (int128) while Spark emits BIGINT — the driver's *typed* hash gate
  * then fails even though values match (round-3 `window_session_gap` bug).
  *
  * Rule: every `SUM(...)` must be (a) wrapped in an outer `CAST(`, or
  * (b) summing an argument already cast to DECIMAL/DOUBLE/etc (typed sums
  * keep their type), or (c) aliased and re-cast downstream
  * (`CAST(alias AS BIGINT)` — the `sessionize` discipline). Anything else
  * fails this suite with the offending query + snippet, BEFORE the driver
  * gate can.
  */
class OracleLintSpec extends AnyFunSuite {

  private val sumRe = "(?i)\\bsum\\s*\\(".r

  /** Index just past the balanced close paren matching the paren at `open`. */
  private def closeOf(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sql.length
  }

  private def isTypedArg(arg: String): Boolean =
    "(?i)\\bas\\s+(decimal|double|float|real|bigint|hugeint)".r
      .findFirstIn(arg).isDefined || arg.contains("::")

  private def isCastWrapped(sql: String, sumStart: Int): Boolean =
    "(?i)cast\\s*\\(\\s*$".r
      .findFirstIn(sql.substring(0, sumStart)).isDefined

  /** Skip an optional `OVER (...)` / `OVER w` clause after the SUM's args. */
  private def skipOver(sql: String, from: Int): Int = {
    val tail = sql.substring(from)
    val m = "(?i)^\\s*over\\s*".r.findFirstIn(tail)
    m match {
      case None => from
      case Some(o) =>
        val p = from + o.length
        if (p < sql.length && sql.charAt(p) == '(') closeOf(sql, p)
        else "^\\w+".r.findFirstIn(sql.substring(p))
          .map(w => p + w.length).getOrElse(p)
    }
  }

  private def aliasAt(sql: String, from: Int): Option[String] =
    "(?i)^\\s*as\\s+(\\w+)".r.findFirstMatchIn(sql.substring(from))
      .map(_.group(1))

  /** Ranges of every depth-0 `SELECT ... FROM` projection list — the only
    * expressions whose DuckDB types reach the driver's hash (CTE and
    * subquery intermediates are re-typed by whatever consumes them).
    * Handles UNION-chains (several depth-0 SELECTs).
    */
  private def outputProjections(sql: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var depth = 0
    var i = 0
    var selStart = -1
    def wordAt(k: String): Boolean =
      sql.regionMatches(true, i, k, 0, k.length) &&
        (i == 0 || !sql.charAt(i - 1).isLetterOrDigit) &&
        (i + k.length >= sql.length ||
          !sql.charAt(i + k.length).isLetterOrDigit)
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && wordAt("select")) selStart = i + 6
          else if (depth == 0 && selStart >= 0 && wordAt("from")) {
            out += ((selStart, i))
            selStart = -1
          }
      }
      i += 1
    }
    if (selStart >= 0) out += ((selStart, sql.length)) // FROM-less SELECT
    out.toSeq
  }

  /** Spans of `CAST( ... )` bodies within [from, until). */
  private def castSpans(sql: String, from: Int, until: Int): Seq[(Int, Int)] =
    "(?i)\\bcast\\s*\\(".r.findAllMatchIn(sql.substring(from, until)).map {
      m =>
        val open = from + m.end - 1
        (from + m.start, math.min(until, closeOf(sql, open)))
    }.toSeq

  private def lint(name: String, sql: String): Seq[String] = {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    lintInto(bad, name, sql)
    bad.toSeq
  }

  test("every oracle integer SUM is cast before it reaches the output") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      lintInto(bad, name, sql)
    }
    assert(bad.isEmpty,
      "\nOracles whose SUM would type-drift (DuckDB HUGEINT vs Spark " +
        "BIGINT) at the driver's typed hash gate:\n  " +
        bad.mkString("\n  "))
  }

  /** Round-8 lint (the round-7 tpch_q1 lesson): a DECIMAL-typed *declared
    * output column* is a cross-engine hash hazard even when every value is
    * bit-identical in both engines — the driver hashes typed results, and
    * decimal columns pass through each engine's decimal canonicalization
    * (scale surfacing, double→decimal cast rounding convention, Arrow
    * decimal128 encoding), which vary BY VERSION: the r7 decimal-out tpch_q1
    * passed the local DuckDB 1.0.0 gate and failed the driver's. Decimals
    * are the right ACCUMULATOR type (order-independent exact sums) but the
    * declared surface must present as double/bigint/string, whose hash
    * conventions are version-stable. The Spark-side schema is authoritative:
    * if Spark surfaces no decimal, a decimal-typed oracle column fails the
    * driver's schema gate loudly (caught at the local sf0.01 pass), not
    * silently at the hash.
    *
    * Allowlist: name → justification; empty today, on purpose. Anything new
    * that genuinely must surface decimal needs sf0.01 AND sf1 driver-class
    * evidence recorded here.
    */
  test("no declared query surfaces a DECIMAL-typed output column") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftFunctions.ensureRegistered(spark)
    val sf = "/root/testdata/sf0.001"
    val allow = Map.empty[String, String]
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !allow.contains(name)) {
      scala.util.Try(fn(spark, sf).schema).toOption.foreach { schema =>
        for (f <- schema.fields
             if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
          bad += s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    assert(bad.isEmpty,
      "\nDECIMAL-typed declared output columns (cross-engine decimal " +
        "canonicalization is version-convention territory — surface as " +
        "double/bigint/string instead, or allowlist with driver evidence):" +
        "\n  " + bad.mkString("\n  "))
  }

  /** Best-effort oracle-side twin of the schema lint: an outermost
    * `CAST(... AS DECIMAL...)` in a depth-0 output projection surfaces a
    * decimal column from the oracle. (The Spark-side schema check above is
    * the authoritative gate — a decimal-only-on-the-oracle-side column
    * fails the driver's schema compare — but this catches the mistake at
    * authoring time, with the query name attached.)
    */
  test("no oracle projects an outermost decimal cast") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      for ((a, b) <- outputProjections(sql)) {
        val spans = castSpans(sql, a, b)
        for ((ca, cb) <- spans
             if !spans.exists { case (oa, ob) =>
               (oa, ob) != (ca, cb) && oa <= ca && cb <= ob }) {
          val body = sql.substring(ca, cb)
          // the cast's target type is the trailing `AS <type>)` of its own
          // span; a DECIMAL target surfacing at output level is the hazard
          val decimalTarget =
            "(?i)\\bas\\s+decimal(\\s*\\([0-9, ]*\\))?\\s*\\)\\s*$".r
              .findFirstIn(body).isDefined
          if (decimalTarget)
            bad += s"$name: output-level `${body.replaceAll("\\s+", " ").take(80)}`"
        }
      }
    }
    assert(bad.isEmpty,
      "\nOracles projecting an outermost DECIMAL cast (decimal output " +
        "columns are the round-7 tpch_q1 hazard class):\n  " +
        bad.mkString("\n  "))
  }

  test("the lint catches the round-3 window_session_gap drift pattern") {
    // The exact shape that passed the round-3 value-lenient local check and
    // failed the driver's typed hash: windowed integer SUM aliased in a
    // subquery, projected bare by the outer SELECT.
    val regression =
      """SELECT user_id, session_idx, count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM events)
        |GROUP BY user_id, session_idx""".stripMargin
    assert(lint("regression", regression).nonEmpty)
    // And the sessionize discipline (outer CAST) passes.
    val fixed = regression.replace(
      "SELECT user_id, session_idx,",
      "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,")
    assert(lint("fixed", fixed).isEmpty)
  }

  private def lintInto(bad: scala.collection.mutable.ListBuffer[String],
      name: String, sql: String): Unit = {
      val projections = outputProjections(sql)
      def inOutput(pos: Int): Boolean =
        projections.exists { case (a, b) => pos >= a && pos < b }
      def casted(pos: Int): Boolean = projections.exists { case (a, b) =>
        pos >= a && pos < b &&
          castSpans(sql, a, b).exists { case (ca, cb) => pos > ca && pos < cb }
      }
      for (m <- sumRe.findAllMatchIn(sql)) {
        val open = sql.indexOf('(', m.start)
        val argEnd = closeOf(sql, open)
        val arg = sql.substring(open + 1, argEnd - 1)
        val typed = isTypedArg(arg)
        val wrapped = isCastWrapped(sql, m.start)
        if (!typed && !wrapped) {
          // The sum itself sits in an output projection uncast?
          val directLeak = inOutput(m.start) && !casted(m.start)
          // Or its alias is projected bare by a depth-0 SELECT?
          val after = skipOver(sql, argEnd)
          val aliasLeak = aliasAt(sql, after).exists { a =>
            s"(?i)(?<!\\bas\\s{1,8})\\b$a\\b".r.findAllMatchIn(sql).exists {
              am => inOutput(am.start) && !casted(am.start)
            }
          }
          if (directLeak || aliasLeak) {
            val snip = sql.substring(m.start,
              math.min(sql.length, argEnd + 30)).replaceAll("\\s+", " ")
            bad += s"$name: uncast SUM reaches output `$snip`"
          }
        }
      }
  }
}
