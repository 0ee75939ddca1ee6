package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CsvRoundTripSpec extends SparkSpec {

  test("header CSV round trip reproduces the parquet rows, names from the header line") {
    import spark.implicits._
    val out = CsvRoundTrip.csvHeaderRoundTrip(spark, sf)
    // names must have come from the written header (no explicit schema)
    assert(out.columns.toSeq === Seq("event_id", "user_id", "event_type", "value"))
    val expected = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", round($"value", 2).as("value"))
      .orderBy($"event_id")
    assert(out.exceptAll(expected).count() === 0L)
    assert(expected.exceptAll(out).count() === 0L)
  }

  test("empty string and NULL survive the round trip as distinct values") {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-csv-nullsafe", sf).toString
    val src = Seq((1L, "x"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
    CsvRoundTrip.writeCsv(src, out)
    val back = CsvRoundTrip.readCsv(spark, out)
      .select($"id".cast("long").as("id"), $"v")
      .orderBy($"id")
      .collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, ""), (3L, null)))
  }

  test("the written part files actually carry the header line") {
    CsvRoundTrip.csvHeaderRoundTrip(spark, sf).count() // materialize the write
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(f => f.getName.startsWith(s"graft-csv-${TmpNonce.value}"))
      .maxBy(_.lastModified)
    val part = dir.listFiles().filter(_.getName.endsWith(".csv")).head
    val firstLine = scala.io.Source.fromFile(part).getLines().next()
    assert(firstLine === "event_id,user_id,event_type,value")
  }
}
