package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.core.{BloomJoinOps, Tables}

class BloomSpec extends SparkSpec {

  test("prunedJoin equals the plain join (no false negatives)") {
    import spark.implicits._
    val li = Tables.read(spark, sf, "lineitem").select("l_suppkey", "l_orderkey")
      .withColumnRenamed("l_suppkey", "s_suppkey")
    val dim = Tables.read(spark, sf, "supplier")
      .filter(col("s_nationkey") < 5).select("s_suppkey", "s_name")
    val got = BloomJoinOps.prunedJoin(li, dim, "s_suppkey")
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    val want = li.join(dim, Seq("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bloom prune keeps every matching row and drops null keys") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), Some(999L), None)
      .toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val bf = dim.stat.bloomFilter("k", 100, 0.01)
    val kept = fact.filter(
      BloomJoinOps.mightContain(col("k"), BloomJoinOps.serialize(bf)))
      .as[Option[Long]].collect().flatten.toSet
    assert(Set(1L, 2L).subsetOf(kept), "false negative")
    assert(!kept.contains(999L) || true) // 999 may survive as a false positive
    assert(!fact.filter(BloomJoinOps.mightContain(col("k"),
      BloomJoinOps.serialize(bf))).collect().map(_.isNullAt(0)).exists(identity),
      "NULL keys must be dropped (inner-join equality semantics)")
  }

  test("string keys probe the same filter semantics") {
    import spark.implicits._
    val dim = Seq("a", "b").toDF("s")
    val bf = BloomJoinOps.serialize({
      val f = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      f.putBinary("a".getBytes("UTF-8")); f.putBinary("b".getBytes("UTF-8")); f
    })
    val kept = Seq("a", "b", "zzz-not-there").toDF("s")
      .filter(BloomJoinOps.mightContain(col("s"), bf))
      .as[String].collect().toSet
    assert(Set("a", "b").subsetOf(kept))
  }

  test("string-keyed prunedJoin keeps non-numeric keys (no silent drops)") {
    import spark.implicits._
    // a long-cast build/probe would NULL these keys out and drop every row
    val fact = Seq("clerk-a", "clerk-b", "clerk-a", "clerk-z").toDF("k")
    val dim = Seq(("clerk-a", 1), ("clerk-b", 2), ("clerk-q", 3)).toDF("k", "v")
    val got = BloomJoinOps.prunedJoin(fact, dim, "k")
      .as[(String, Int)].collect().sorted.toSeq
    val want = fact.join(dim, Seq("k")).as[(String, Int)].collect().sorted.toSeq
    assert(got == want && got.size == 3)
  }

  test("an empty build side prunes everything instead of crashing") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L).toDF("k")
    val dim = Seq.empty[Long].toDF("k")
    // DataFrameStatFunctions.bloomFilter NPEs on empty input; ours must not
    assert(BloomJoinOps.prunedJoin(fact, dim, "k").count() == 0L)
  }

  test("the prune sits below the shuffle of a sort-merge join") {
    // AQE wraps subtrees in query stages that plan.collect can't traverse;
    // the shape under test is the same either way.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val li = Tables.read(spark, sf, "lineitem").select("l_suppkey")
        .withColumnRenamed("l_suppkey", "s_suppkey")
      val dim = Tables.read(spark, sf, "supplier")
        .filter(col("s_nationkey") < 5).select("s_suppkey", "s_name")
      BloomJoinOps.prunedJoin(li, dim, "s_suppkey")
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected SortMergeJoin, got:\n$plan")
    // the bloom predicate must appear under an exchange (map-side, pre-shuffle)
    val underShuffle = plan.collect { case e: ShuffleExchangeExec => e }
      .exists(_.child.toString.contains("graft_bloom_contains"))
    assert(underShuffle, s"bloom prune not below the exchange:\n$plan")
  }
}
