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

  /** Index of the first `//` that starts a COMMENT — i.e. sits outside
    * any string literal — or -1. A naive `line.indexOf("//")` truncates
    * the scanned code at a `//` inside a string (e.g. a URL), letting a
    * later unannotated call escape; conversely a `round-ok` inside a
    * string literal must not waive a real call (round-11 advice fix).
    * Handles `"…"` with escapes, `"""…"""` spans that open and close on
    * the line, and the `'"'` char literal; a multi-line triple-quote
    * body is treated as code, which only errs toward flagging. */
  def commentStart(line: String): Int = {
    var i = 0; var inStr = false; var inTriple = false
    while (i < line.length) {
      if (inTriple) {
        if (line.startsWith("\"\"\"", i)) { inTriple = false; i += 3 } else i += 1
      } else if (inStr) {
        if (line.charAt(i) == '\\') i += 2
        else { if (line.charAt(i) == '"') inStr = false; i += 1 }
      } else if (line.startsWith("\"\"\"", i)) { inTriple = true; i += 3 }
      else if (line.charAt(i) == '"') { inStr = true; i += 1 }
      else if (line.startsWith("'\"'", i)) i += 3
      else if (line.startsWith("//", i)) return i
      else i += 1
    }
    -1
  }

  /** Lines (1-indexed, with path) violating the discipline in `text`. */
  def violations(path: String, text: String): Seq[String] =
    text.linesIterator.zipWithIndex.flatMap { case (line, i) =>
      val trimmed = line.trim
      val isComment = trimmed.startsWith("*") || trimmed.startsWith("//") ||
        trimmed.startsWith("/*")
      // the call must be in the code portion (string-literal contents
      // COUNT as code: a round( inside an expr("…") string still hashes);
      // the waiver must sit in the trailing comment, outside literals
      val ci = commentStart(line)
      val code = if (ci == -1) line else line.substring(0, ci)
      val waived = ci != -1 && line.substring(ci).contains("round-ok")
      if (!isComment && callRe.matches(code) && !waived)
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

  test("string literals cannot hide a call or smuggle a waiver") {
    val fixture =
      """val url = "https://x.test//a" ; val y = round(z, 2)
        |val s = "round-ok inside a string" ; val w = round(z, 2)
        |val sql = expr("round(v, 2)")
        |val fine = "https://x.test//a" ; val ok2 = round(z, 2) // round-ok: ulp-snap
        |""".stripMargin
    val bad = violations("Fixture.scala", fixture)
    // line 1: the "//" inside the URL must not truncate the scan;
    // line 2: a round-ok INSIDE a literal is not a waiver;
    // line 3: a round( inside a SQL string still hashes — flagged;
    // line 4: real trailing-comment waiver honored
    assert(bad.size === 3, bad.mkString("\n"))
    assert(bad.map(_.split(":")(1)) === Seq("1", "2", "3"))
  }

  test("commentStart scans string syntax correctly") {
    assert(commentStart("""val a = 1 // c""") === 10)
    assert(commentStart("val u = \"//not\" // real") === 16)
    assert(commentStart("val q = '\"' // c") === 12)
    assert(commentStart("val t = \"\"\"a//b\"\"\" // c") === 19)
    assert(commentStart("""val n = 1 + 2""") === -1)
  }
}
