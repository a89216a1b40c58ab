package graft

import scala.collection.mutable

import graft.ops.Bpe

class BpeSpec extends SparkSpec {

  /** Independent single-threaded BPE trainer (textbook formulation) used as
    * ground truth: word-freq table, then per round count adjacent pairs,
    * take (freq desc, left, right) argmax, greedy left-to-right merge.
    */
  private def referenceBpe(words: Map[String, Long], merges: Int)
      : Seq[(Int, String, String, Long)] = {
    var tbl = words.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val out = mutable.Buffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      val counts = mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (sym, f) =>
        sym.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, n))
        tbl = tbl.map { case (sym, f) =>
          val acc = mutable.Buffer.empty[String]
          sym.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc(acc.length - 1) = l + r
            else acc += x
          }
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  test("train matches the hand-computed table on a toy corpus") {
    import spark.implicits._
    val docs = Seq("ab ab ab", "abc").toDF("text")
    val got = Bpe.train(docs, merges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    // pairs: (a,b)x4, (b,c)x1 -> merge1 = (a,b,4); then (ab,c)x1
    assert(got == Seq((1, "a", "b", 4L), (2, "ab", "c", 1L)))
  }

  test("train agrees with the reference trainer on real documents") {
    import spark.implicits._
    val docs = graft.core.Tables.read(spark, sf, "documents")
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.TextOps.tokens(org.apache.spark.sql.functions.col("text")))
        .as("w"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) >= 1)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val want = referenceBpe(words, merges = 6)
    val got = Bpe.train(docs, merges = 6)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == want)
  }

  test("ties break lexicographically, deterministically") {
    import spark.implicits._
    // (b,a) and (a,b) both occur twice; (a,b) must win the tie
    val docs = Seq("ba ba ab ab").toDF("text")
    val got = Bpe.train(docs, merges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("batch selection survives the self-pair cascade (aaa-run corpus)") {
    import spark.implicits._
    // Serial order: (a,a,200) then (aa,a,100) — the pair CREATED by merge 1
    // outranks the disjoint (b,c,99). A batcher that only checks symbol
    // disjointness would wrongly emit (b,c) at rank 2; the exact rule stops
    // the batch after a self-pair.
    val docs = (Seq.fill(100)("aaa") ++ Seq.fill(99)("bc") ++
      Seq.fill(98)("de") ++ Seq.fill(97)("fg")).map(w => s"$w").toDF("text")
    val words = Map("aaa" -> 100L, "bc" -> 99L, "de" -> 98L, "fg" -> 97L)
    val want = referenceBpe(words, merges = 5)
    val got = Bpe.train(docs, merges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == want)
    assert(want.take(2).map(t => (t._2, t._3)) == Seq(("a", "a"), ("aa", "a")))
  }

  test("exact batching needs far fewer driver rounds than one per merge") {
    import spark.implicits._
    val docs = graft.core.Tables.read(spark, sf, "documents")
    val (df, rounds) = Bpe.trainWithRounds(docs, merges = 8)
    val got = df.as[(Int, String, String, Long)].collect().toSeq
    assert(got.size == 8)
    // serial = 8 rounds (≈2 jobs each with eager checkpoints); on this
    // corpus the exact batch rule does it in 3 one-job rounds
    assert(rounds <= 4, s"expected <= 4 rounds for 8 merges, took $rounds")
    // and the table is still the serial one
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.TextOps.tokens(org.apache.spark.sql.functions.col("text")))
        .as("w"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) >= 1)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    assert(got == referenceBpe(words, merges = 8))
  }

  test("trainFast: valid deterministic table, rounds <= merges/4") {
    import spark.implicits._
    val docs = graft.core.Tables.read(spark, sf, "documents")
    val (df, rounds) = Bpe.trainFastWithRounds(docs, merges = 32)
    val got = df.as[(Int, String, String, Long)].collect().toSeq
    assert(got.size == 32)
    assert(got.map(_._1) == (1 to 32))
    assert(got.forall(_._4 > 0))
    assert(rounds <= 8, s"expected <= 8 rounds for 32 merges, took $rounds")
    // counts are exact at round start and ties are ordered, so re-run is
    // bit-identical
    val again = Bpe.trainFast(docs, merges = 32)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(again == got)
  }

  /** Independent serial encoder: chars, then each merge greedy
    * left-to-right — the same pass `referenceBpe` applies while training.
    */
  private def referenceEncode(w: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (sym, (l, r)) =>
      val acc = mutable.Buffer.empty[String]
      sym.foreach { x =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc(acc.length - 1) = l + r
        else acc += x
      }
      acc.toVector
    }

  test("encode: token counts match the serial encoder on real documents") {
    import spark.implicits._
    val docs = graft.core.Tables.read(spark, sf, "documents")
    val tbl = Bpe.train(docs, merges = 8)
    val merges = tbl.orderBy("merge_rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val got = Bpe.encode(docs, tbl)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        id -> text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
          .map(w => referenceEncode(w, merges).length.toLong).sum
      }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("encode: greedy order on repeated-pair runs matches the reference") {
    import spark.implicits._
    // 'aaaa' -> [aa][aa]; 'aaa' -> [aa][a]; cascades via the (aa,aa) merge
    val docs = Seq((1L, "aaaa aaaa aaa aa a"), (2L, "aaaaaa ab"))
      .toDF("doc_id", "text")
    val tbl = Bpe.train(docs, merges = 3)
    val merges = tbl.orderBy("merge_rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val got = Bpe.encode(docs, tbl)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> "aaaa aaaa aaa aa a".split(" ")
        .map(w => referenceEncode(w, merges).length.toLong).sum,
      2L -> "aaaaaa ab".split(" ")
        .map(w => referenceEncode(w, merges).length.toLong).sum)
    assert(got == want)
  }
}
