package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travel as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * run per-partition over Arrow-sized batches (the Scala analog of
  * `mapInPandas`), so executors stream batches instead of
  * row-at-a-time JNI calls.
  *
  * The actual codec step is STUBBED (this container ships no
  * image/audio libraries): `StubCodec` produces deterministic fake
  * pixels/frames from the byte content. The Spark-side plumbing —
  * schema, binary handling, partition-level batching, explode of
  * per-frame rows — is real and tested; swapping `StubCodec` for a
  * JNI/javacpp decoder is a one-object change.
  */
object Multimodal {

  /** Output schema of the stub image decode. */
  case class MediaMeta(
      id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      channels: Int)

  case class FrameRow(id: Long, frame_idx: Int, frame_hash: Long)

  /** STUB decode: deterministic pseudo-metadata derived from content
    * bytes (stands in for an image header parse).
    */
  object StubCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"

    def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024), 3)
    }

    /** Deterministic per-frame content hash (stands in for a decoded
      * frame tensor).
      */
    def frameHash(bytes: Array[Byte], idx: Int): Long = {
      var acc = 1125899906842597L
      var i = idx % math.max(bytes.length, 1)
      var n = 0
      while (n < math.min(bytes.length, 256)) {
        acc = acc * 31 + bytes(i)
        i = (i + 1) % math.max(bytes.length, 1)
        n += 1
      }
      acc
    }
  }

  /** Attach a binary payload column (for corpora that store text-only,
    * e.g. the testdata `documents` table, the bytes are the encoded
    * text — the plumbing is identical for real media bytes).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))

  /** Decode metadata per media item, partition-streamed (mapPartitions
    * — one codec instance per partition, not per row).
    */
  def decodeMeta(df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c) = StubCodec.decodeDims(bytes)
          MediaMeta(id, bytes.length, StubCodec.sniffFormat(bytes), w, h, c)
        }
      }
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame up to
    * `maxFrames`, one output row per frame (the explode happens on
    * executors; a real decoder would emit tensors here).
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      stride: Int = 10,
      maxFrames: Int = 8): Dataset[FrameRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = math.min(maxFrames, math.max(bytes.length / 64, 1))
          (0 until nFrames).iterator.map { f =>
            FrameRow(id, f * stride, StubCodec.frameHash(bytes, f * stride))
          }
        }
      }
  }

  /** "Resize" feature stub: fixed-length feature vector from payload
    * bytes (stands in for resize→pool). Pure column expression —
    * stays in codegen, no JVM round trip.
    */
  def byteHistogramFeatures(payload: org.apache.spark.sql.Column, buckets: Int = 16)
      : org.apache.spark.sql.Column = {
    // fold payload bytes (as hex pairs) into a bucketed histogram
    val hexChars = filter(split(hex(payload), ""), c => length(c) > 0)
    transform(sequence(lit(0), lit(buckets - 1)), b =>
      size(filter(hexChars, c => pmod(ascii(c), lit(buckets)) === b)))
  }
}
