package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-cleanup kernels for training corpora: NFC normalization
  * (UAX#15 — one canonical byte sequence per visually-identical string, a
  * prerequisite for hash-based dedup over web text) and accent folding
  * (NFD decompose + drop combining marks — DuckDB's `strip_accents`
  * semantics, verified char-for-char so q57 stays oracle-checkable;
  * compatibility ligatures like ﬁ and ß are NOT folded, matching DuckDB).
  *
  * Native expressions, not UDFs: the normalizer call participates in
  * whole-stage codegen via a static method, the same pattern as
  * [[SimHashExpr]].
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeExprs.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExprs.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeExprs.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExprs.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object UnicodeExprs {
  import java.text.Normalizer

  // precompiled: this runs per ROW of a corpus-scale kernel —
  // String.replaceAll would recompile the pattern on every call
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** NFD decompose, drop ALL marks (\p{M}: nonspacing AND
    * spacing/enclosing), NFC recompose. Aligned to DuckDB
    * `strip_accents` (utf8proc STRIPMARK) by MEASUREMENT: é→e, Å→A
    * (Latin Mn); Devanagari की→क (Mc vowel sign removed); Hangul 한→한
    * (no marks — the final recompose restores the syllable the NFD step
    * decomposed); ß and ligatures untouched (not marks). */
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(
        Marks.matcher(Normalizer.normalize(s.toString, Normalizer.Form.NFD))
          .replaceAll(""),
        Normalizer.Form.NFC))
}
