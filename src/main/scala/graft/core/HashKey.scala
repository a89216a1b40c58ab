package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the surrogate-key hash, shared by interpreted eval and
  * generated code. Semantics (reference `etl/core/utils.py:5-8`): MD5 over the
  * UTF-8 bytes of the pipe-joined natural key, hex digest read as ONE 128-bit
  * unsigned integer, reduced mod 10^9. Must stay bit-for-bit stable — it is
  * cross-checked against Python/DuckDB vectors in HashKeySpec.
  */
object HashKeyOps {
  private val Mod = 1000000000L
  // 2^64 mod 1e9 — lets us fold the 128-bit digest with 64-bit arithmetic:
  // ((hi % m) * (2^64 % m) + lo % m) % m; max intermediate ~7.1e17 < 2^63.
  private val TwoPow64Mod = 709551616L

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5Mod1e9(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    // digest is big-endian: bytes 0-7 = high 64 bits of the hex number.
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (digest(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (digest(i) & 0xffL); i += 1 }
    val hiMod = java.lang.Long.remainderUnsigned(hi, Mod)
    val loMod = java.lang.Long.remainderUnsigned(lo, Mod)
    (hiMod * TwoPow64Mod + loMod) % Mod
  }

  /** Non-negative 63-bit hash: high half of the MD5 digest, unsigned-shifted
    * right by one. Used as a general-purpose stable hash for minhash/simhash
    * seeds. Public construction only (MD5 + big-endian read), so a DuckDB
    * oracle mirrors it exactly with `CAST(md5_number_upper(x) // 2 AS BIGINT)`.
    */
  def md5Hi64(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (digest(i) & 0xffL); i += 1 }
    hi >>> 1
  }

}

/** Catalyst expression: `md5_mod_1e9(string) -> long`.
  *
  * The reference's only non-relational scalar (`etl/core/utils.py:5-8`,
  * applied per-row at `etl/core/key_mapper.py:24` and every dim transform).
  * Implemented as a native expression with `doGenCode` so it stays inside
  * whole-stage codegen instead of breaking the pipeline like a Scala UDF
  * would.
  */
case class Md5Mod1e9(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_mod_1e9 requires string input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    HashKeyOps.md5Mod1e9(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.HashKeyOps.md5Mod1e9($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Mod1e9 =
    copy(child = newChild)
  override def prettyName: String = "md5_mod_1e9"
}

/** Same shape, full-width high-64 hash (for minhash/simhash seeding). */
case class Md5Hi64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hi64 requires string input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    HashKeyOps.md5Hi64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.HashKeyOps.md5Hi64($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Hi64 =
    copy(child = newChild)
  override def prettyName: String = "md5_hi64"
}

/** Session-scoped registration of graft's native expressions, exposed through
  * the public `call_function` API (no private Spark internals needed at call
  * sites).
  */
object GraftFunctions {
  private val registeredSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Arity gate for the registrations below: a wrong-arity call surfaces
    * as a clean analysis-time error naming the expected signature (the way
    * built-in registrations do) instead of an IndexOutOfBoundsException
    * from a bare `exprs(i)`.
    */
  private def arity(name: String, sig: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: expected $n " +
          s"($name($sig)), found ${exprs.length}")
      build(exprs)
    }

  def ensureRegistered(spark: SparkSession): Unit =
    if (registeredSessions.add(spark)) {
      // Reference semantics are pandas' errors="coerce": invalid casts/array
      // indexes yield null, never exceptions (SURVEY §7.4.5). Spark 4 flipped
      // ANSI mode on by default — turn it off for graft sessions.
      spark.conf.set("spark.sql.ansi.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); read as long, rebuilt in
      // Tables.read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "graft_md5_mod_1e9",
        arity("graft_md5_mod_1e9", "str", 1)(e => Md5Mod1e9(e.head)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_md5_hi64",
        arity("graft_md5_hi64", "str", 1)(e => Md5Hi64(e.head)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_top_k_by",
        arity("graft_top_k_by", "value, key, k", 3)(e =>
          TopKBy.withCasts(e(0), e(1), e(2))),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_dot",
        arity("graft_dot", "vecA, vecB", 2)(e => DotFold(e(0), e(1))),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_sumsq",
        arity("graft_sumsq", "vec", 1)(e => SumSqFold(e.head)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_dot_mixed",
        arity("graft_dot_mixed", "vecA, vecB", 2)(e => DotMixed(e(0), e(1))),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_bloom_contains",
        arity("graft_bloom_contains", "filter, value", 2)(e =>
          BloomMightContain(e(0), e(1))),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_image_dims",
        arity("graft_image_dims", "bytes", 1)(e => graft.ops.ImageDims(e.head)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_audio_meta",
        arity("graft_audio_meta", "bytes", 1)(e => graft.ops.AudioMeta(e.head)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_jaro_winkler",
        arity("graft_jaro_winkler", "strA, strB", 2)(e =>
          JaroWinklerSim(e(0), e(1))),
        "built-in")
      reg.createOrReplaceTempFunction(
        "graft_blocklist_mask",
        arity("graft_blocklist_mask", "text, phrases", 2)(e =>
          graft.ops.BlocklistMask.fromExprs(e(0), e(1))),
        "built-in")
      // sessions built without GraftExtensions still get the HOF→kernel
      // optimizer rewrite through the experimental hook
      if (!spark.experimental.extraOptimizations
            .contains(graft.plans.FoldVectorHofs)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.FoldVectorHofs
      }
      if (!spark.experimental.extraOptimizations
            .contains(graft.plans.RangeBinJoin)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.RangeBinJoin
      }
      if (!spark.experimental.extraOptimizations
            .contains(graft.plans.GlobalRankRewrite)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            graft.plans.GlobalRankRewrite
      }
      // the rewrite's target needs its strategy in the same session
      graft.plans.GlobalRank.ensureStrategy(spark)
    }

  /** `hash_key(cols)`: surrogate key over already-normalized natural-key
    * columns — pipe-join then 128-bit-MD5 mod 1e9
    * (reference `etl/core/utils.py:5-8`). Inputs are cast to string; callers
    * must have normalized nulls to "" first (utils.py:15) so pipe positions
    * stay aligned — `concat_ws` would silently skip a null and desynchronize
    * the key.
    */
  def hashKey(cols: Seq[Column]): Column =
    call_function("graft_md5_mod_1e9",
      concat_ws("|", cols.map(_.cast("string")): _*))

  /** Stable full-width 64-bit hash (high half of MD5), for hash families. */
  def hash64(c: Column): Column = call_function("graft_md5_hi64", c)
}
