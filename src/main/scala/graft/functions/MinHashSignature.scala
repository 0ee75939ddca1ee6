package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a full `perms`-permutation MinHash
  * signature of a shingle set in ONE pass: each element is xxhash64'd once,
  * then every permutation is an odd-multiplier affine remix of that base
  * hash (a 2^64 bijection, splitmix64-derived constants).
  *
  * Exists because the expression-combinator formulation
  * (`transform(sequence(0, P-1), p -> array_min(transform(arr, sh ->
  * xxhash64(p, sh))))`) evaluates P × |arr| interpreted lambda calls and
  * P string re-hashes per row — measured 146 s for 10k docs at sf0.1,
  * >98% of the whole MinHash-LSH operator. This expression does the same
  * work as one tight JVM loop (|arr| string hashes + P×|arr| long
  * multiply-mins) and participates in whole-stage codegen via a static
  * call, so the dedup path scales to corpus size × 32 perms at 100 TB.
  *
  * Ref semantics: near-dup detection extension of the reference's exact
  * `drop_duplicates` dedup (parser_media_articles.py:83–84,98).
  */
case class MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(perms > 0 && perms <= MinHashSignature.MaxPerms,
    s"perms must be in [1, ${MinHashSignature.MaxPerms}]")

  // covariant override: AbstractDataType itself is private[sql]
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $perms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val MaxPerms = 256

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // Affine permutation constants h -> A(p)*h + B(p) (A odd => bijective on
  // Z/2^64); fixed and seedless so signatures are deterministic across runs.
  private val A = Array.tabulate(MaxPerms)(p => splitmix64(2L * p) | 1L)
  private val B = Array.tabulate(MaxPerms)(p => splitmix64(2L * p + 1L))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, perms: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, 42L)
        var p = 0
        while (p < perms) {
          val v = A(p) * h + B(p)
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
