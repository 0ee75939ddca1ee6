package graft.operators

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("FakeDecoder: deterministic features from payload bytes") {
    val rec = Multimodal.MediaRecord(7L, "image", "abc".getBytes("UTF-8"))
    val f = Multimodal.FakeDecoder.decode(rec)
    assert(f.n_bytes === 3)
    assert(f.head_byte === 'a'.toInt)
    assert(f.checksum_hex === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    val empty = Multimodal.FakeDecoder.decode(Multimodal.MediaRecord(8L, "audio", Array.empty))
    assert(empty.head_byte === -1)
    assert(empty.n_bytes === 0)
  }

  test("decodeFeatures: one feature row per media row, kinds preserved") {
    val out = Multimodal.decodeFeatures(spark, sf).collect()
    assert(out.length.toLong === Tables.documents(spark, sf).count())
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val kind = r.getAs[String]("kind")
      assert(kind === (if (id % 2 == 0) "image" else "audio"))
      assert(r.getAs[Long]("n_bytes") >= 0L)
      assert(r.getAs[String]("checksum_hex").length === 32)
    }
  }

  test("resize: every-4th-byte downsample preserves head byte and size law") {
    val out = Multimodal.resize(spark, sf).collect()
    assert(out.length.toLong === Tables.documents(spark, sf).count())
    out.foreach { r =>
      val orig = r.getAs[Long]("orig_bytes")
      assert(r.getAs[Long]("resized_bytes") === (orig + 3) / 4)
      assert(r.getAs[Boolean]("head_preserved"))
    }
  }

  test("frameSample: fan-out count = ceil(payload_bytes / frameBytes) per row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val frames = Multimodal.frameSample(spark, sf, frameBytes = 64)
    val perDoc = frames.groupBy($"media_id").agg(count(lit(1)).as("n_frames"))
    val expect = Multimodal.mediaTable(spark, sf).toDF()
      .filter(length($"payload") > 0)
      .select($"media_id", ceil(length($"payload") / 64.0).cast("long").as("want"))
    val bad = perDoc.join(expect, "media_id")
      .filter($"n_frames" =!= $"want").count()
    assert(bad === 0L)
  }
}
