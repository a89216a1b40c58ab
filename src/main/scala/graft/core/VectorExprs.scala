package graft.core

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Runtime kernels for the embedding hot path. Bit-compatible with the
  * higher-order-function forms they replace
  * (`aggregate(zip_with(a,b,(x,y)=>x*y), 0.0d, (acc,x)=>acc+x)`): products
  * in FLOAT (as `float * float` evaluates), accumulation in DOUBLE,
  * strictly left-to-right — so every existing cosine oracle stays
  * hash-identical. Null element / length-mismatch → null, exactly as the
  * HOF chain nulls out.
  *
  * Why native: Spark's higher-order functions are CodegenFallback — each
  * row pays interpreted lambda dispatch per element inside the codegen'd
  * stage. These expressions generate a tight primitive loop instead.
  */
object VectorOps {

  def dotFold(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    val n = if (na > nb) na else nb
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (i >= na || i >= nb || a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i) * b.getFloat(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** float-vector × double-vector fold — the hyperplane-projection
    * semantics (`zip_with(v, signs, _*_)` widens the float element to
    * double BEFORE the multiply, unlike the float-product [[dotFold]]).
    */
  def dotMixed(a: ArrayData, s: ArrayData): java.lang.Double = {
    val na = a.numElements(); val ns = s.numElements()
    val n = if (na > ns) na else ns
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (i >= na || i >= ns || a.isNullAt(i) || s.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * s.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def sumSqFold(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      acc += v.getFloat(i) * v.getFloat(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** `graft_dot(array<float>, array<float>) -> double` — sequential-fold dot
  * product, codegen'd.
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.core.VectorOps.dotFold($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** `graft_dot_mixed(array<float>, array<double>) -> double` — projection
  * fold for hyperplane sketches, codegen'd.
  */
case class DotMixed(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_mixed requires (array<float>, array<double>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotMixed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotMixedRes")
      s"""
         |java.lang.Double $tmp = graft.core.VectorOps.dotMixed($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotMixed =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_mixed"
}

/** `graft_sumsq(array<float>) -> double` — sum of squares (norm² — callers
  * apply sqrt), codegen'd.
  */
case class SumSqFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sumsq requires array<float> input, got ${other.simpleString}")
    }
  override def nullSafeEval(v: Any): Any =
    VectorOps.sumSqFold(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("sumSqRes")
      s"""
         |java.lang.Double $tmp = graft.core.VectorOps.sumSqFold($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SumSqFold =
    copy(child = newChild)
  override def prettyName: String = "graft_sumsq"
}
