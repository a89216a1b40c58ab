package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matcher: ONE left-to-right pass over the
  * text finds every occurrence of every phrase, regardless of how many
  * phrases the blocklist holds — the standard automaton (goto + failure +
  * collapsed output links) that replaces K `contains` scans (O(K·n)) with
  * O(n + matches). The curation use-case is a safety/PII/boilerplate
  * blocklist applied to every document of a 100 TB corpus: per-doc cost
  * must not grow with the list.
  *
  * ≤ 64 phrases per automaton so the hit set rides ONE long as a bitmask
  * (bit i = phrase i occurred) — a bounded, codegen-friendly return that
  * downstream aggregates unpack with shift/mask arithmetic (the
  * curation_pii_scrub presentation idiom). Matching is over UTF-16 code
  * units of the phrases/text, exact substring semantics (same as SQL
  * `contains`), case handling left to the caller.
  */
final class AhoCorasick(val phrases: Array[String]) extends Serializable {
  require(phrases.nonEmpty && phrases.length <= 64,
    s"blocklist holds 1..64 phrases, got ${phrases.length}")
  require(phrases.forall(_.nonEmpty), "blocklist phrases must be non-empty")

  // flat automaton tables, built once on the driver and shipped as one
  // reference object into generated code
  private val gotoMaps =
    mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outMasks = mutable.ArrayBuffer(0L)
  private val fails = mutable.ArrayBuffer(0)

  phrases.zipWithIndex.foreach { case (p, i) =>
    var node = 0
    p.foreach { ch =>
      node = gotoMaps(node).getOrElseUpdate(ch, {
        gotoMaps += mutable.HashMap.empty[Char, Int]
        outMasks += 0L
        fails += 0
        gotoMaps.size - 1
      })
    }
    outMasks(node) |= 1L << i
  }
  // BFS failure links; output masks collapse the fail chain at build time
  // so the scan never walks it
  locally {
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { c => fails(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outMasks(u) |= outMasks(fails(u))
      gotoMaps(u).foreach { case (ch, v) =>
        var f = fails(u)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fails(f)
        fails(v) = gotoMaps(f).get(ch).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
  }
  private val gotoArr: Array[java.util.HashMap[Character, Integer]] =
    gotoMaps.map { m =>
      val h = new java.util.HashMap[Character, Integer](m.size * 2)
      m.foreach { case (k, v) => h.put(k, v) }
      h
    }.toArray
  private val failArr: Array[Int] = fails.toArray
  private val outArr: Array[Long] = outMasks.toArray

  /** Bitmask of phrases occurring in `s` (bit i = phrases(i) present). */
  def hitMask(us: UTF8String): Long = {
    if (us == null) return 0L
    val s = us.toString
    var node = 0
    var mask = 0L
    var i = 0
    val n = s.length
    while (i < n && mask != -1L) {
      val ch = s.charAt(i)
      var nxt = gotoArr(node).get(ch)
      while (nxt == null && node != 0) {
        node = failArr(node)
        nxt = gotoArr(node).get(ch)
      }
      node = if (nxt == null) 0 else nxt.intValue()
      mask |= outArr(node)
      i += 1
    }
    mask
  }
}

/** Catalyst expression `graft_blocklist_mask(text, array('p0','p1',…)) ->
  * long`: the phrase array must be foldable (a plan-time literal — the
  * blocklist IS configuration); the automaton is built once at expression
  * construction and shipped into generated code as a reference object, so
  * the per-row work is a single automaton pass inside whole-stage codegen.
  */
case class BlocklistMask(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = new AhoCorasick(phrases.toArray)

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_blocklist_mask requires string input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ac.hitMask(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.hitMask($c)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BlocklistMask = copy(child = newChild)
  override def prettyName: String = "graft_blocklist_mask"
}

object BlocklistMask {
  /** Registration adapter: the second argument must fold to an array of
    * strings at plan time. */
  def fromExprs(text: Expression, arr: Expression): BlocklistMask = {
    require(arr.foldable,
      "graft_blocklist_mask: the phrase array must be a literal")
    val data = arr.eval().asInstanceOf[ArrayData]
    val phrases = (0 until data.numElements())
      .map(i => data.getUTF8String(i).toString)
    BlocklistMask(text, phrases)
  }
}

/** The blocklist census as a shared batch/stream transform: per phrase,
  * how many docs hit — ONE automaton pass per doc, 12 shift/mask
  * aggregates off the mask column. Every aggregate is a sum/count monoid,
  * so the IDENTICAL transform runs as a streaming complete-mode aggregate
  * over a document feed (BlocklistStreamSpec proves batch ≡ stream on the
  * same files) — the shape a live ingestion safety screen runs in.
  */
object Blocklist {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  def census(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val masked = docs.select(call_function("graft_blocklist_mask",
      col("text"), array(phrases.map(lit): _*)).as("m"))
    val sums = phrases.indices.map(j =>
      sum(shiftright(col("m"), j).bitwiseAND(1)).as(s"s$j"))
    masked.agg(count(lit(1)).as("n_docs"), sums: _*)
      .select(explode(array(phrases.zipWithIndex.map { case (p, j) =>
        struct(lit(p).as("phrase"), col(s"s$j").as("n_docs_hit"))
      }: _*)).as("e"), col("n_docs"))
      .select(col("e.phrase").as("phrase"),
        col("e.n_docs_hit").as("n_docs_hit"), col("n_docs"))
  }
}
