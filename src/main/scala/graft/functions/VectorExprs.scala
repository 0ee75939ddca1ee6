package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native twins of the vector HOF combinators in [[VectorFunctions]].
  *
  * The combinator forms (`aggregate(zip_with(...))`) evaluate one
  * interpreted lambda call per vector element — for sign-LSH that is
  * bits × dim calls per row, the dominant cost of every ANN query at
  * sf0.1. These expressions run the same arithmetic as a single tight JVM
  * loop per row, inside whole-stage codegen.
  *
  * FP parity: accumulation is a left fold in element order starting from
  * 0.0 — the exact operation sequence of `aggregate(..., lit(0.0),
  * (acc, x) => acc + x)` and of the DuckDB oracle's `list_sum` — so
  * results are bit-identical to the combinator forms and the SQL oracle.
  */
object VectorExprs {
  private[functions] def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def dotCompute(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Double = {
    val n = x.numElements()
    require(y.numElements() == n,
      s"vector length mismatch: $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += a * b
      i += 1
    }
    acc
  }

  /** Plane j's 1-based coordinate i: ((i*(2j+3)) mod 101) - 50 — the
    * integer-exact hyperplane family shared with the SQL oracle
    * (VectorFunctions.planeMultiplier). */
  def lshCompute(x: ArrayData, bits: Int, xf: Boolean): Long = {
    val n = x.numElements()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      val mult = 2 * j + 3
      var proj = 0.0
      var i = 0
      while (i < n) {
        val v = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        proj += v * ((((i + 1) * mult) % 101) - 50).toDouble
        i += 1
      }
      if (proj > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}

/** Index-ordered dot product of two equal-length numeric arrays
  * (float or double elements), as DOUBLE. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val xf = VectorExprs.elemIsFloat(left)
  private lazy val yf = VectorExprs.elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], xf, yf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprs.dotCompute($a, $b, $xf, $yf)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket (long in [0, 2^bits)) of a numeric array over the
  * deterministic mod-101 hyperplane family. */
case class SignLshBucketExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62, "bits must be in [1, 62]")
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  private lazy val xf = VectorExprs.elemIsFloat(child)

  override def nullSafeEval(input: Any): Any =
    VectorExprs.lshCompute(input.asInstanceOf[ArrayData], bits, xf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExprs.lshCompute($c, $bits, $xf)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketExpr =
    copy(child = newChild)
}
