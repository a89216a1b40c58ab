package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Tables
import graft.ops.AhoCorasick

/** Aho-Corasick blocklist kernel: the failure-link cases that break naive
  * implementations, plus automaton ≡ K-contains equivalence over real
  * fixture text (the property the text_blocklist oracle gate re-proves
  * cross-engine).
  */
class BlocklistSpec extends SparkSpec {

  private def mask(phrases: Seq[String], text: String): Long =
    new AhoCorasick(phrases.toArray).hitMask(UTF8String.fromString(text))

  test("failure links: suffix-overlapping and nested phrases all fire") {
    // "she" contains "he"; matching "she" must also report "he" (output
    // mask collapsed through the fail chain)
    assert(mask(Seq("he", "she", "his", "hers"), "ushers") == 0xBL) // he,she,hers
    // nested: pattern fully inside another
    assert(mask(Seq("abcde", "bcd"), "abcde") == 3L)
    // a failed long match must still catch the pattern starting mid-way
    assert(mask(Seq("abxy", "bxz"), "abxz") == 2L)
    // repeated chars: self-overlapping occurrences
    assert(mask(Seq("aa", "aaa"), "aaaa") == 3L)
    // no match
    assert(mask(Seq("xyz"), "abc") == 0L)
    // match at the very start and very end
    assert(mask(Seq("ab", "cd"), "abzzcd") == 3L)
  }

  test("automaton ≡ K contains scans over fixture documents") {
    val phrases = Seq("fast table", "table table", "scan query",
      "slow filter", "key agg", "spark a")
    val ac = new AhoCorasick(phrases.toArray)
    val docs = Tables.read(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    assert(docs.nonEmpty)
    docs.foreach { t =>
      val got = ac.hitMask(UTF8String.fromString(t))
      val want = phrases.zipWithIndex
        .collect { case (p, i) if t.contains(p) => 1L << i }
        .foldLeft(0L)(_ | _)
      assert(got == want, s"mask mismatch on: ${t.take(60)}")
    }
  }

  test("expression folds the phrase list, rejects non-literals, codegens") {
    val df = spark.range(2)
      .select(concat(lit("xx fast "),
        when(col("id") === 0, "table").otherwise("nope")).as("text"))
      .select(col("text"), call_function("graft_blocklist_mask",
        col("text"), array(lit("fast table"), lit("nope"))).as("m"))
    val rows = df.orderBy("text").collect()
    assert(rows(0).getLong(1) == 2L) // "xx fast nope" hits phrase 1
    assert(rows(1).getLong(1) == 1L) // "xx fast table" hits phrase 0
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project") &&
      planStr.contains("graft_blocklist_mask"), planStr)
    // a non-foldable phrase array must fail loudly at plan time
    intercept[Exception] {
      spark.range(1).select(call_function("graft_blocklist_mask",
        lit("x"), array(col("id").cast("string")))).collect()
    }
  }
}
