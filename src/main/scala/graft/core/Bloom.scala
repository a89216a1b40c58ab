package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction: prune a huge probe side map-side,
  * BEFORE its shuffle, using a compact filter built from the (already
  * selective) build side's keys.
  *
  * The 100 TB story: when a dim is too big to broadcast, Spark plans a
  * sort-merge join that shuffles the ENTIRE fact table — even if only a
  * few percent of fact rows can match. A bloom over the dim keys (a few
  * MB for tens of millions of keys at 1% fpp) rides to every fact task and
  * discards non-matching rows at the scan, so the exchange moves only
  * candidate rows. False positives are removed by the exact join that
  * follows; false negatives are impossible, so the result is exactly the
  * plain join. Spark's own runtime filter (`InjectRuntimeFilter`) applies
  * the same idea only under narrow thresholds; this operator is the
  * explicit, always-on form.
  *
  * Reference ties: the reference joins facts to dims per row via a pandas
  * merge after filtering dims in memory (`etl/core/key_mapper.py:24`,
  * `etl/core/dim_loader.py`); at cluster scale the equivalent
  * pre-join reduction is this bloom prune.
  */
object BloomJoinOps {

  /** Serialize a spark BloomFilter to bytes (plan-embeddable literal). */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** `fact ⋈ dim` on `key`, with the fact side bloom-pruned before its
    * shuffle. The dim keyset is aggregated into a bloom (treeAggregate —
    * per-partition filters OR-merged, driver holds one fixed-size bitset,
    * exactly a broadcast-build cost), embedded in the plan as a binary
    * literal, and evaluated inside whole-stage codegen at the fact scan.
    * The merge hint keeps the demo on the sort-merge path the operator
    * exists for — with a broadcastable dim Spark would already prune.
    */
  /** Aggregate a long key column into a bloom filter: per-partition
    * filters OR-merged up a tree. Unlike `DataFrameStatFunctions
    * .bloomFilter`, an EMPTY build side yields an empty filter (prunes
    * everything — the correct inner-join answer) instead of NPE-ing.
    */
  def buildLongFilter(df: DataFrame, key: String,
                      expectedItems: Long, fpp: Double): BloomFilter =
    df.select(col(key).cast("long")).na.drop().rdd
      .map(_.getLong(0))
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (bf, v) => { bf.putLong(v); bf },
        (a, b) => { a.mergeInPlace(b); a })

  /** Aggregate a string key column into a bloom filter over its UTF-8
    * bytes — the encoding [[BloomMightContain]] probes with
    * (`UTF8String.getBytes`), so build and probe always agree.
    */
  def buildStringFilter(df: DataFrame, key: String,
                        expectedItems: Long, fpp: Double): BloomFilter =
    df.select(col(key).cast("string")).na.drop().rdd
      .map(_.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (bf, v) => { bf.putBinary(v); bf },
        (a, b) => { a.mergeInPlace(b); a })

  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 expectedItems: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.ensureRegistered(fact.sparkSession)
    // Build and probe in the key's own domain: casting a string key to
    // long would NULL out non-numeric values and silently drop rows the
    // plain join matches, breaking the "exactly the plain join" contract.
    val pruned = fact.schema(key).dataType match {
      case StringType =>
        val bf = buildStringFilter(dim, key, expectedItems, fpp)
        fact.filter(mightContain(col(key), serialize(bf)))
      case ByteType | ShortType | IntegerType | LongType =>
        val bf = buildLongFilter(dim, key, expectedItems, fpp)
        fact.filter(mightContain(col(key).cast("long"), serialize(bf)))
      case dt => throw new IllegalArgumentException(
        s"prunedJoin supports integral/string join keys, got $dt")
    }
    pruned.join(dim.hint("merge"), Seq(key))
  }

  /** Column face of [[BloomMightContain]] (functions registered by
    * [[GraftFunctions.ensureRegistered]] / [[graft.GraftExtensions]]).
    */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    call_function("graft_bloom_contains", key, lit(bloomBytes))
}

/** Catalyst predicate `graft_bloom_contains(key, bloomBytes) -> boolean`.
  *
  * The filter deserializes ONCE per task (transient lazy, shipped to
  * generated code as a reference object — same mechanism Spark's
  * `BloomFilterMightContain` uses), so per-row cost is two hash probes in
  * a bitset with no allocation, and the predicate stays inside
  * whole-stage codegen. NULL keys yield NULL (join equality semantics: a
  * NULL key can never match, so the prune drops it — matching the inner
  * join that follows).
  */
case class BloomMightContain(child: Expression, bloomExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = bloomExpr
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloomExpr.foldable || bloomExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a foldable binary bloom argument")
    else child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains supports long/string keys, got $dt")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomExpr.eval(null).asInstanceOf[Array[Byte]]
    BloomJoinOps.deserialize(bytes)
  }

  override def nullSafeEval(key: Any, ignored: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(key.asInstanceOf[Long])
    case StringType =>
      filter.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    val childGen = child.genCode(ctx)
    val probe = child.dataType match {
      case LongType => s"$bloomRef.mightContainLong(${childGen.value})"
      case StringType => s"$bloomRef.mightContainBinary(${childGen.value}.getBytes())"
    }
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) { ${ev.value} = $probe; }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(child = newLeft, bloomExpr = newRight)
  override def prettyName: String = "graft_bloom_contains"
}
