package graft

import org.apache.spark.sql.DataFrame

/** Mechanical prevention for the round-13 five-duplicate /
  * silent-overload-capture class (round-13 verdict ask #4).
  *
  * Incident: five "new" operators re-implemented coverage that existing
  * queries already had, and two of the new methods carried the SAME NAME
  * as existing methods with default args — Scala overload resolution
  * prefers the exact-arity alternative, so the new 2-arg overloads
  * silently captured the EXISTING queries' `(s, d)` calls. Nothing
  * failed at compile time; three unrelated spec failures in a full test
  * run were the only signal.
  *
  * Two guards, both falsifiability-tested on fixtures below:
  *
  *  1. DISTINCT INVOCATIONS — every `SparkEntry.queries` entry must
  *     build a semantically distinct plan. Two entries that call the
  *     same operator method with the same args canonicalize to the same
  *     analyzed plan, whatever the registration spells — this is the
  *     semantic version of "no two entries calling the same method with
  *     the same args", and it also catches re-implemented duplicate
  *     coverage whenever it lands on the identical plan.
  *
  *  2. NO DEFAULTED-PARAM OVERLOADS — no public method on any shipped
  *     operator object may be overloaded across arities while any
  *     alternative carries default arguments (the `name$default$N`
  *     synthetic marks it). That is precisely the configuration where
  *     adding an overload re-routes existing call sites without a
  *     compile error.
  */
class RegistryIntegritySpec extends SparkSpec {

  // ---- guard 1: distinct invocations ------------------------------------

  /** Pairs of names whose analyzed plans are semantically equal. */
  def duplicatePlans(entries: Seq[(String, DataFrame)]): Seq[String] = {
    val plans = entries.map { case (n, df) =>
      (n, df.queryExecution.analyzed.canonicalized)
    }
    plans.groupBy(_._2.hashCode).values.filter(_.size > 1).toSeq.flatMap {
      grp => grp.combinations(2).collect {
        case Seq((n1, p1), (n2, p2)) if p1.sameResult(p2) => s"$n1 == $n2"
      }
    }.sorted
  }

  test("no two registered queries resolve to the same operator invocation") {
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      val df = try q(spark, sf)
               catch { case e: Throwable => fail(s"$name failed to build: $e") }
      graft.CacheGuard.release()
      (name, df)
    }
    val dups = duplicatePlans(entries)
    assert(dups.isEmpty,
      "registered queries building the SAME analyzed plan (duplicate " +
        "coverage or captured call — the round-13 incident):\n" +
        dups.mkString("\n"))
    assert(entries.size >= 295,
      s"registry shrank to ${entries.size} — scope broke?")
  }

  test("guard 1 is falsifiable: two entries invoking one method alike are caught") {
    def inv(): DataFrame = operators.Relational.conditionalCounts(spark, sf)
    val dups = duplicatePlans(Seq("fake_a" -> inv(), "fake_b" -> inv()))
    graft.CacheGuard.release()
    assert(dups === Seq("fake_a == fake_b"))
    // and two genuinely different plans are NOT flagged
    val distinct = duplicatePlans(Seq(
      "fake_a" -> inv(),
      "fake_c" -> operators.Relational.distinctTypes(spark, sf)))
    graft.CacheGuard.release()
    assert(distinct.isEmpty)
  }

  // ---- guard 2: no defaulted-param overloads ----------------------------

  /** Hazardous method names of one object class: overloaded across
    * arities with at least one alternative carrying default args. */
  def defaultedOverloads(cls: Class[_]): Seq[String] = {
    val ms = cls.getDeclaredMethods.toSeq.filterNot(_.isSynthetic)
    val defaulted = ms.map(_.getName).filter(_.contains("$default$"))
      .map(_.split("\\$default\\$")(0)).toSet
    ms.filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(_.getName.contains("$"))
      .groupBy(_.getName)
      .collect { case (name, alts)
          if alts.map(_.getParameterCount).distinct.size > 1 &&
            defaulted.contains(name) =>
        s"${cls.getName}.$name arities=" +
          alts.map(_.getParameterCount).sorted.mkString(",")
      }.toSeq.sorted
  }

  /** Every top-level object class under the shipped packages, discovered
    * from the compiled-classes directory (the spec runs off a directory
    * classpath; a rename/new object is picked up automatically). */
  def shippedObjectClasses: Seq[Class[_]] = {
    val root = new java.io.File(
      SparkEntry.getClass.getProtectionDomain.getCodeSource
        .getLocation.toURI)
    val pkgs = Seq("graft", "graft.operators", "graft.streaming",
      "graft.sources", "graft.functions", "graft.sources.pagefeed")
    pkgs.flatMap { pkg =>
      val dir = new java.io.File(root, pkg.replace('.', '/'))
      Option(dir.listFiles()).toSeq.flatten.toSeq
        .map(_.getName)
        .filter(n => n.endsWith("$.class") &&
          !n.dropRight("$.class".length).contains("$"))
        .map(n => Class.forName(pkg + "." + n.dropRight(".class".length)))
    }
  }

  test("no shipped operator object has defaulted-parameter overloads") {
    val classes = shippedObjectClasses
    assert(classes.size >= 30, s"object scan found only ${classes.size} — " +
      "classpath layout changed? " + classes.map(_.getName).mkString(", "))
    val bad = classes.flatMap(defaultedOverloads)
    assert(bad.isEmpty,
      "defaulted-param overloads (adding/keeping these silently re-routes " +
        "existing call sites — use a distinct method name instead):\n" +
        bad.mkString("\n"))
  }

  test("guard 2 is falsifiable: the hazard fixture is caught") {
    val bad = defaultedOverloads(RegistryIntegritySpec.OverloadHazardFixture.getClass)
    assert(bad.size === 1, bad.mkString("\n"))
    assert(bad.head.contains("capture") && bad.head.contains("arities=2,3"))
    // the safe shape — distinct names, defaults allowed — is NOT flagged
    val ok = defaultedOverloads(RegistryIntegritySpec.SafeFixture.getClass)
    assert(ok.isEmpty, ok.mkString("\n"))
  }
}

object RegistryIntegritySpec {
  /** TEST-ONLY reproduction of the round-13 hazard: `capture(a, b)` used
    * to be callable as `capture(x, y)` via the default on `c`; the
    * 2-arg exact-arity overload now wins resolution and every existing
    * call site changed meaning without a compile error. */
  object OverloadHazardFixture {
    def capture(a: Int, b: Int): Int = a * b
    def capture(a: Int, b: Int, c: Int = 1): Int = a + b + c
  }

  /** The safe shape the codebase uses instead (distinct names). */
  object SafeFixture {
    def run(a: Int, b: Int = 0): Int = a + b
    def runWith(a: Int, b: Int, c: Int): Int = a + b + c
  }
}
