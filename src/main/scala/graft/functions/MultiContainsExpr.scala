package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Aho–Corasick multi-keyword containment: true iff ANY of the keywords
  * occurs as a substring of the (already-normalized) input. Semantics are
  * exactly `keywords.exists(text.contains)` — the reference's
  * `any(k in text for k in keywords)` (`reddit_subm_extraction.py:57–59`)
  * — so oracle SQL stays a disjunction of LIKE patterns.
  *
  * Why it exists (SURVEY.md §4): the regex-alternation plan
  * (`rlike("(k1|k2|…)")`) and the per-keyword `contains` disjunction both
  * scale O(keywords) per row; a pipeline matching thousands of allowlist
  * terms over 100 TB wants the automaton's O(text length) single pass.
  * The automaton is built once per JVM (transient lazy on executors;
  * shipped into generated code via `addReferenceObj`). */
case class MultiContainsExpr(child: Expression, keywords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
    "keywords must be non-empty")

  // covariant override: AbstractDataType itself is private[sql]
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "multi_contains"

  @transient private lazy val automaton = new MultiContainsExpr.Automaton(keywords)

  override def nullSafeEval(input: Any): Any =
    automaton.containsAny(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[MultiContainsExpr.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.containsAny($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContainsExpr =
    copy(child = newChild)
}

object MultiContainsExpr {
  /** Aho–Corasick automaton: goto/fail tables over chars, terminal flag
    * propagated through suffix (fail) links. */
  final class Automaton(keywords: Seq[String]) extends Serializable {
    import scala.collection.mutable
    private val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val terminal = mutable.ArrayBuffer(false)

    keywords.foreach { kw =>
      var s = 0
      kw.foreach { ch =>
        s = gotoMaps(s).getOrElseUpdate(ch, {
          gotoMaps += mutable.Map.empty[Char, Int]
          terminal += false
          gotoMaps.length - 1
        })
      }
      terminal(s) = true
    }

    private val fail = new Array[Int](gotoMaps.length)
    locally { // BFS order guarantees fail(r) is final before children of r
      val queue = mutable.Queue.empty[Int]
      gotoMaps(0).values.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoMaps(r).foreach { case (ch, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
          fail(s) = gotoMaps(f).getOrElse(ch, 0)
          if (terminal(fail(s))) terminal(s) = true
        }
      }
    }

    def containsAny(text: String): Boolean = {
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
        s = gotoMaps(s).getOrElse(ch, 0)
        if (terminal(s)) return true
        i += 1
      }
      false
    }
  }
}
