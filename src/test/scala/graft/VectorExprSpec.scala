package graft

import org.apache.spark.sql.functions._

import graft.core.GraftFunctions
import graft.ops.Similarity

/** Native vector expressions: codegen reachability, HOF bit-compatibility,
  * and null semantics.
  */
class VectorExprSpec extends SparkSpec {

  private def vecDf = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.1f, 0.2f, 0.3f), Array(-0.1f, 0.5f, 2.0f))
    ).toDF("id", "a", "b")
  }

  test("graft_dot equals the HOF fold bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val rows = vecDf.select(
      Similarity.dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null element and length mismatch null out, like zip_with") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)),
      (Array[java.lang.Float](1.0f), Array[java.lang.Float](1.0f, 2.0f))
    ).toDF("a", "b")
      .select(col("a").cast("array<float>"), col("b").cast("array<float>"))
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("optimizer folds the hand-written HOF dot into graft_dot") {
    GraftFunctions.ensureRegistered(spark)
    val hof = aggregate(zip_with(col("embedding"), col("embedding"),
      (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val df = graft.core.Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), hof.as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"),
      s"HOF fold not rewritten to the native kernel:\n$plan")
    assert(!plan.contains("zip_with") && !plan.contains("lambdafunction"))
    // and the rewrite is value-identical to the explicit kernel call
    val native = graft.core.Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"))
    assert(df.orderBy("vec_id").collect().map(_.toSeq).toSeq ==
      native.orderBy("vec_id").collect().map(_.toSeq).toSeq)
  }

  test("dot stays inside whole-stage codegen (no CodegenFallback)") {
    GraftFunctions.ensureRegistered(spark)
    // a real file scan — a local relation would be constant-folded away
    val df = graft.core.Tables.read(spark, sf, "embeddings")
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen stage marker; the projection
    // carrying graft_dot must sit inside one.
    assert(plan.contains("*(1) Project [graft_dot"))
    // the old HOF chain would plan aggregate(zip_with(...)) lambda nodes
    assert(!plan.contains("zip_with") && !plan.contains("lambdafunction"))
  }
}
