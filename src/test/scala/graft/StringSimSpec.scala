package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.StringSimOps

/** Jaro-Winkler kernel vectors, pinned against DuckDB's
  * jaro_winkler_similarity output (probed round 11) — the parity the
  * join_linkage_jw oracle gate depends on: match window, transposition
  * halving, and the 0.7 boost threshold.
  */
class StringSimSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSimOps.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("vectors match DuckDB jaro_winkler_similarity") {
    assert(r6(jw("martha", "marhta")) == 0.961111)
    assert(r6(jw("dwayne", "duane")) == 0.84)
    assert(r6(jw("dixon", "dicksonx")) == 0.813333)
    // boost threshold: prefix-4 pair at jaro 0.6 stays UNboosted
    assert(r6(jw("abcdxxxxxx", "abcdyyyyyy")) == 0.6)
    // window floor: adjacent transposition in 2-char strings can't match
    assert(jw("ab", "ba") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("abcde", "") == 0.0)
    assert(jw("", "") == 1.0)
  }

  test("identity, symmetry, and range over fixture names") {
    val names = Seq("Customer#000000019", "Customer#00000001X",
      "Customer#000000190", "Supplier#000000003", "xyz")
    for (a <- names; b <- names) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a), s"asymmetric for ($a, $b)")
      if (a == b) assert(s == 1.0)
    }
  }

  test("expression is codegen'd, null-safe, and matches the kernel") {
    // range-based frame so the projection can't constant-fold into a
    // LocalTableScan — the call must run inside generated code
    val df = spark.range(4)
      .select(col("id"),
        element_at(array(lit("martha"), lit("dixon"), lit(null), lit("x")),
          col("id").cast("int") + 1).as("a"),
        element_at(array(lit("marhta"), lit("dicksonx"), lit("x"), lit(null)),
          col("id").cast("int") + 1).as("b"))
      .select(col("id"),
        call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
    val rows = df.orderBy("id").drop("id").collect()
    assert(rows(0).getDouble(0) == jw("martha", "marhta"))
    assert(rows(1).getDouble(0) == jw("dixon", "dicksonx"))
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
    // stays inside whole-stage codegen (no UDF/eval fallback boundary) —
    // the "*(1)" span marker over the projection that calls the expression
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project") &&
      planStr.contains("graft_jaro_winkler"), planStr)
  }
}
