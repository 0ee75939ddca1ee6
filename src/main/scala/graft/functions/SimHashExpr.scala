package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash of a token multiset: per bit, the sign of
  * Σ_tokens (±1 by the token hash's bit). The token hash is the first 4
  * md5 bytes read big-endian — EXACTLY `conv(substring(md5(tok),1,8),16,10)`
  * (TextFunctions.md5Hash32) and the oracle's
  * `CAST('0x' || substr(md5(tok),1,8) AS BIGINT)`, so results stay
  * DuckDB-oracled.
  *
  * Replaces the relational formulation (explode tokens × explode 32 bits →
  * two groupBy shuffles over |corpus|×|tokens|×32 rows) with per-row
  * expression work — the only remaining shuffle in the simhash query is
  * the final ORDER BY. Integer arithmetic throughout: no FP parity risk. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  // covariant override: AbstractDataType itself is private[sql]
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = digest.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // first 8 hex chars of md5 == first 4 bytes big-endian, unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }
}
