package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-array digest kernels for the Jaccard dedup path (q20): the block
  * key `min(md5(element))` and the shuffle-payload hash array
  * `xxhash64(element)*`. Both existed as `transform(...)` combinator
  * forms — byte-identical results, but one interpreted lambda eval per
  * SHINGLE per row in the operator's cache-materialization hot loop (the
  * same interpreted-HOF tax the native MinHash signature removed, 146 s →
  * <2 s). These run as single codegen'd JVM loops.
  */
case class Md5MinExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_min"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ArrayDigestExprs.md5Min(input.asInstanceOf[ArrayData])
  // NOT defineCodeGen: the kernel returns Java null for empty/all-null
  // arrays (array_min semantics) and the result's isNull must track that,
  // not just the child's nullness — otherwise codegen'd plans carry a
  // non-null-flagged null and diverge from interpreted eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayDigestExprs.md5Min($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Md5MinExpr =
    copy(child = newChild)
}

case class XxHash64ArrayExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_array"
  override def nullSafeEval(input: Any): Any =
    ArrayDigestExprs.xxhash64Array(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayDigestExprs.xxhash64Array($c)")
  override protected def withNewChildInternal(newChild: Expression): XxHash64ArrayExpr =
    copy(child = newChild)
}

object ArrayDigestExprs {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** Lexicographic min of per-element lowercase md5 hex — identical to
    * `array_min(transform(arr, md5))` and the oracle's `min(md5(sh))`.
    * Null for empty/all-null arrays (as array_min). */
  def md5Min(arr: ArrayData): UTF8String = {
    val md = digest.get()
    var min: String = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        val hex = new Array[Char](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = HexChars((d(j) >> 4) & 0xf)
          hex(2 * j + 1) = HexChars(d(j) & 0xf)
          j += 1
        }
        val h = new String(hex)
        if (min == null || h < min) min = h
      }
      i += 1
    }
    if (min == null) null else UTF8String.fromString(min)
  }

  /** xxhash64 (seed 42, Spark's default) of each element — identical to
    * `transform(arr, xxhash64)` with non-null elements. */
  def xxhash64Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) = if (s == null) 42L else XXH64.hashUTF8String(s, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}
