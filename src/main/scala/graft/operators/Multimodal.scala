package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (north-star extension): media payloads are
  * opaque BINARY columns with typed metadata, processed per-partition by a
  * batch decoder. The image/audio codec libraries are not in this
  * container, so `FakeDecoder` is a clearly-marked deterministic stand-in —
  * the Spark-side contract (schema, partition iteration, batch shape,
  * output struct) is the real, tested part and is exactly what a JNI/
  * library-backed decoder would plug into.
  *
  * At scale this is `mapPartitions` so the decoder is initialized once per
  * partition (not per row) — the same lifecycle a Python `mapInPandas`
  * batch UDF gets — and binary payloads never pass through codegen'd
  * expressions that would copy them.
  */
object Multimodal {

  /** Typed media record: payload + metadata travelling together. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features. For images this would be (width, height, channels,
    * mean_luma…); the fake decoder derives deterministic stand-ins from
    * the payload bytes so tests are stable and oracle-checkable. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           head_byte: Int, checksum_hex: String)

  /** STUB: deterministic fake decode. A real implementation would hand
    * `payload` to an image/audio codec here; everything around it stays. */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val head = if (r.payload.nonEmpty) r.payload(0) & 0xff else -1
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(r.media_id, r.kind, r.payload.length, head, hex)
    }
  }

  /** Build a media table from `documents` (text bytes as the opaque
    * payload — the container has no real media, TESTDATA.md). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        when($"doc_id" % 2 === 0, "image").otherwise("audio").as("kind"),
        $"text".cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Decode features via per-partition batch iteration (decoder init once
    * per partition). Output ordered for determinism. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it =>
        // per-partition decoder initialization would happen here
        it.map(FakeDecoder.decode)
      }
      .toDF()
      .select($"media_id", $"kind",
        $"n_bytes".cast("long").as("n_bytes"),
        $"head_byte".cast("long").as("head_byte"),
        $"checksum_hex")
      .orderBy($"media_id")
  }

  /** Resize/downsample shape (STUB semantics, real plumbing): a real
    * implementation would decode → scale → re-encode here; the stand-in
    * keeps every `factor`-th payload byte, preserving byte 0. The
    * Spark-side contract — binary in, binary out through mapPartitions,
    * derived metadata surfaced as columns — is exactly what a codec-backed
    * resize plugs into. Oracle checks the observable invariants
    * (resized size = ceil(n/factor), head byte preserved); the resized
    * payload itself is engine-internal. */
  case class ResizedMedia(media_id: Long, kind: String, orig_bytes: Long,
                          resized_bytes: Long, head_preserved: Boolean)

  def resize(spark: SparkSession, dir: String, factor: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { r =>
          // STUB downsample: every factor-th byte (a real resize would
          // decode and rescale); plumbing and invariants are the real part
          val resized = r.payload.indices.collect {
            case i if i % factor == 0 => r.payload(i) }.toArray
          ResizedMedia(r.media_id, r.kind, r.payload.length.toLong,
            resized.length.toLong,
            resized.headOption == r.payload.headOption)
        }
      }
      .toDF()
      .orderBy($"media_id")
  }

  /** Frame-sampling shape: one media row fans out to N per-frame rows
    * (posexplode over fixed-size byte windows) — the plumbing an
    * audio/video frame sampler needs, as pure column expressions. */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      .filter(length($"payload") > 0)
      .select($"media_id", $"kind",
        posexplode(split(conv_payload($"payload"), s"(?<=\\G.{${frameBytes * 2}})")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_hex")
      .filter(length($"frame_hex") > 0)
      .select($"media_id", $"kind", $"frame_no",
        length($"frame_hex").cast("long").as("frame_hex_len"))
      .orderBy($"media_id", $"frame_no")
  }

  private def conv_payload(c: org.apache.spark.sql.Column) = hex(c)
}
