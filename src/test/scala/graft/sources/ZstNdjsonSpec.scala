package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZstNdjsonSpec extends SparkSpec {
  import ZstNdjson._

  private def writeZst(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zst-spec").toFile
    val f = new java.io.File(dir, "dump.json.zst")
    val os = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(f))
    os.write(lines.mkString("\n").getBytes("UTF-8"))
    os.close()
    dir.toString + "/*.zst"
  }

  test("permissive zst scan: good lines parse, missing fields default NULL") {
    val glob = writeZst(Seq(
      """{"event_id":1,"user_id":10,"event_type":"click","value":1.5}""",
      """{"event_id":2,"event_type":"view"}""")) // user_id/value missing
    val df = read(spark, glob, eventSchema)
    val rows = df.orderBy("event_id").collect()
    assert(rows.length === 2)
    assert(rows(1).getAs[Any]("user_id") === null) // .get(field,"") analog
    assert(rows.forall(_.getAs[String](corruptCol) == null))
  }

  test("malformed lines are counted, not fatal (reference's bad counter)") {
    val glob = writeZst(Seq(
      """{"event_id":1,"user_id":10,"event_type":"click","value":1.5}""",
      """not json at all""",
      """{"event_id":3,"user_id":30,"event_type":"view","value":2.0}""",
      """{"broken": """))
    val stats = parseStats(read(spark, glob, eventSchema)).head()
    assert(stats.getAs[Long]("total") === 4)
    assert(stats.getAs[Long]("bad") === 2)
    assert(stats.getAs[Long]("good") === 2)
  }

  test("observedScan: counters ride the query as metrics, result rows unchanged") {
    val glob = writeZst(Seq(
      """{"event_id":1,"user_id":10,"event_type":"click","value":1.5}""",
      """definitely not json""",
      """{"event_id":3,"user_id":30,"event_type":"view","value":2.0}"""))
    val (df, obs) = observedScan(spark, glob, eventSchema)
    val goodRows = df.filter(col(corruptCol).isNull).count()
    assert(goodRows === 2L)
    val m = obs.get
    assert(m("total") === 3L) // bad line counted in metrics...
    assert(m("bad") === 1L)   // ...without surviving into the result
  }

  test("events zst round trip reproduces the parquet rows") {
    val n = graft.Tables.events(spark, sf).count()
    val rt = zstRoundTrip(spark, sf)
    assert(rt.count() === n)
    assert(rt.filter(col("event_id").isNull).count() === 0)
  }

  test("repartitionAfterScan fans the unsplittable scan out") {
    val glob = writeZst((1 to 100).map(i => s"""{"event_id":$i}"""))
    val df = repartitionAfterScan(read(spark, glob, eventSchema), 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 100)
  }
}
