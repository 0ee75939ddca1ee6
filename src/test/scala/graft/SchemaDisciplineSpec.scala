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
  * The walk builds every registered query's DataFrame at the gate SF and
  * inspects `.schema` — analysis only, no jobs for the lazy majority; the
  * handful of eager fixture builders run at sf0.001 where they are cheap.
  * Nested types are walked recursively: a Decimal smuggled inside a
  * struct/array/map field fails the same as a top-level column. */
class SchemaDisciplineSpec extends SparkSpec {

  /** All DecimalType leaves reachable from `dt`, with field paths. */
  def decimalLeaves(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalLeaves(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalLeaves(a.elementType, s"$path[]")
    case m: MapType =>
      decimalLeaves(m.keyType, s"$path{key}") ++
        decimalLeaves(m.valueType, s"$path{value}")
    case _ => Nil
  }

  test("no declared query ships a DecimalType column (hash-fragile across engines)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema =
        try q(spark, sf).schema
        catch { case e: Throwable => fail(s"$name failed to build: $e") }
      graft.CacheGuard.release()
      decimalLeaves(schema, name)
    }
    assert(bad.isEmpty,
      "queries shipping DECIMAL output columns (narrow to BIGINT/VARCHAR " +
        "before the final select — the q212 pattern):\n" + bad.mkString("\n"))
    // and the walk actually covered the registry
    assert(SparkEntry.queries.size >= 295,
      s"registry shrank to ${SparkEntry.queries.size} — scope broke?")
  }

  test("the guard catches a deliberately-Decimal fixture schema") {
    val fixture = StructType(Seq(
      StructField("ok", LongType),
      StructField("num", DecimalType(38, 0)),
      StructField("nest", StructType(Seq(
        StructField("inner", DecimalType(20, 4))))),
      StructField("arr", ArrayType(DecimalType(10, 2))),
      StructField("map", MapType(StringType, DecimalType(12, 0)))))
    val leaves = decimalLeaves(fixture, "fixture")
    assert(leaves.size === 4, leaves.mkString("\n"))
    assert(leaves.head === "fixture.num: DecimalType(38,0)")
  }
}
