package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the `round(` discipline (round-7/round-9): a
  * hash-compared `round(double, N)` is only legal as an annotated
  * ulp-snap BEFORE integer quantization (the `Quant.scala` convention),
  * marked `// round-ok: <why>` on the same line. Until round 10 the
  * convention was enforced only by review; this spec greps the engine
  * sources and fails the build on any unannotated `round(`/`rint(` call,
  * so a future half-rounded double can never silently re-enter a hashed
  * result column.
  *
  * Scope: all engine code under `src/main/scala/graft` EXCEPT
  * `SparkEntry.scala` — its `round(` sites live inside DuckDB oracle SQL
  * string literals, where they are the REQUIRED mirrors of the annotated
  * Spark-side snaps (both engines must round identically for the hash to
  * mean anything). Comment/scaladoc lines are skipped; the annotation
  * must sit on the CODE line itself, where the next editor sees it. */
class QuantDisciplineSpec extends AnyFunSuite {

  private val callRe = """(\bround\(|\brint\(|\.round\()""".r.unanchored

  /** Lines (1-indexed, with path) violating the discipline in `text`. */
  def violations(path: String, text: String): Seq[String] =
    text.linesIterator.zipWithIndex.flatMap { case (line, i) =>
      val trimmed = line.trim
      val isComment = trimmed.startsWith("*") || trimmed.startsWith("//") ||
        trimmed.startsWith("/*")
      // the call must be in the code portion, the waiver anywhere on-line
      val code = line.indexOf("//") match {
        case -1 => line
        case ix => line.substring(0, ix)
      }
      if (!isComment && callRe.matches(code) && !line.contains("round-ok"))
        Some(s"$path:${i + 1}: $trimmed")
      else None
    }.toSeq

  test("every round()/rint() call in engine code carries a // round-ok annotation") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Path.of("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root), s"missing $root (cwd?)")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "SparkEntry.scala")
      .toSeq
    assert(files.size > 30, s"only ${files.size} sources found — scope broke?")
    val bad = files.flatMap(p =>
      violations(p.toString, java.nio.file.Files.readString(p)))
    assert(bad.isEmpty,
      "unannotated round()/rint() calls (add `// round-ok: <why>` only " +
        "for ulp-snaps before integer quantization, else use the exact " +
        "integer form):\n" + bad.mkString("\n"))
    // and the convention is actually in use (the guard guards something)
    val annotated = files.map(p => java.nio.file.Files.readString(p))
      .map(_.linesIterator.count(_.contains("round-ok"))).sum
    assert(annotated >= 5, s"only $annotated round-ok sites — drift?")
  }

  test("the guard catches a deliberately-unannotated fixture") {
    val fixture =
      """val x = floor(round(log(y), 8) * 1e6 + 0.5)
        |// a comment mentioning round( is fine
        |val ok = floor(round(log(y), 8) * 1e6 + 0.5) // round-ok: ulp-snap
        |val r = math.rint(z)
        |""".stripMargin
    val bad = violations("Fixture.scala", fixture)
    assert(bad.size === 2, bad.mkString("\n"))
    assert(bad.head.startsWith("Fixture.scala:1:"))
    assert(bad(1).startsWith("Fixture.scala:4:"))
  }
}
