package graft

import org.apache.spark.sql.types._

/** Mechanical class-kill for the DECIMAL hash-render fragility (round-13,
  * verdict ask #2): a declared query whose OUTPUT schema carries any
  * `DecimalType` column ships a value the driver's cross-engine hash
  * renders differently for Spark `Decimal` vs DuckDB `HUGEINT`/`DECIMAL`
  * — the q64 → q158 → q292 recurrence. Wide integers are fine INTERNALLY
  * (q212 computes chi-square in DECIMAL(38)); the discipline is that the
  * shipped frame narrows them to BIGINT / VARCHAR / DOUBLE first.
  *
  * Round-14 (verdict ask #6) widens the ban to the remaining
  * hash-fragile leaf types:
  *   - `FloatType` — single-precision renders through a different
  *     shortest-repr path than DuckDB's REAL→text (0.1f is
  *     "0.1" vs "0.100000001490116..."-class drift); ship DOUBLE.
  *   - `TimestampNTZType` — no-timezone timestamps cross the
  *     driver-hash seam with engine-local session rendering; `Tables
  *     .events` already normalizes NTZ micros to UTC TimestampType on
  *     scan, and outputs must stay in that discipline.
  *
  * The walk builds every registered query's DataFrame at the gate SF and
  * inspects `.schema` — analysis only, no jobs for the lazy majority; the
  * handful of eager fixture builders run at sf0.001 where they are cheap.
  * Nested types are walked recursively: a banned leaf smuggled inside a
  * struct/array/map field fails the same as a top-level column. */
class SchemaDisciplineSpec extends SparkSpec {

  /** Why each banned leaf type is banned — the failure is actionable. */
  val banned: Map[Class[_], String] = Map(
    (classOf[DecimalType]: Class[_]) ->
      "narrow to BIGINT/VARCHAR before the final select (q212 pattern)",
    (FloatType.getClass: Class[_]) ->
      "ship DOUBLE, not single-precision (render drift across engines)",
    (TimestampNTZType.getClass: Class[_]) ->
      "cast NTZ to UTC TimestampType on scan (Tables.events pattern)")

  /** All banned-type leaves reachable from `dt`, with field paths. */
  def fragileLeaves(dt: DataType, path: String): Seq[String] = dt match {
    case d if banned.keys.exists(_.isInstance(d)) =>
      val why = banned.collectFirst {
        case (cls, msg) if cls.isInstance(d) => msg
      }.get
      Seq(s"$path: $dt — $why")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => fragileLeaves(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => fragileLeaves(a.elementType, s"$path[]")
    case m: MapType =>
      fragileLeaves(m.keyType, s"$path{key}") ++
        fragileLeaves(m.valueType, s"$path{value}")
    case _ => Nil
  }

  test("no declared query ships a Decimal/Float/TimestampNTZ column (hash-fragile across engines)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema =
        try q(spark, sf).schema
        catch { case e: Throwable => fail(s"$name failed to build: $e") }
      graft.CacheGuard.release()
      fragileLeaves(schema, name)
    }
    assert(bad.isEmpty,
      "queries shipping hash-fragile output columns:\n" + bad.mkString("\n"))
    // and the walk actually covered the registry
    assert(SparkEntry.queries.size >= 295,
      s"registry shrank to ${SparkEntry.queries.size} — scope broke?")
  }

  test("the guard catches deliberately-fragile fixture schemas") {
    val fixture = StructType(Seq(
      StructField("ok", LongType),
      StructField("num", DecimalType(38, 0)),
      StructField("nest", StructType(Seq(
        StructField("inner", DecimalType(20, 4))))),
      StructField("arr", ArrayType(DecimalType(10, 2))),
      StructField("map", MapType(StringType, DecimalType(12, 0)))))
    val leaves = fragileLeaves(fixture, "fixture")
    assert(leaves.size === 4, leaves.mkString("\n"))
    assert(leaves.head.startsWith("fixture.num: DecimalType(38,0)"))

    // the round-14 additions, top-level and nested
    val fixture2 = StructType(Seq(
      StructField("f", FloatType),
      StructField("ts", TimestampNTZType),
      StructField("okTs", TimestampType), // zoned timestamps are FINE
      StructField("nest", ArrayType(StructType(Seq(
        StructField("g", FloatType)))))))
    val leaves2 = fragileLeaves(fixture2, "fx2")
    assert(leaves2.size === 3, leaves2.mkString("\n"))
    assert(leaves2.exists(_.startsWith("fx2.f: FloatType")))
    assert(leaves2.exists(_.startsWith("fx2.ts: TimestampNTZType")))
    assert(leaves2.exists(_.startsWith("fx2.nest[].g: FloatType")))
    assert(!leaves2.exists(_.contains("okTs")))
  }
}
