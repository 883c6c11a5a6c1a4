package graft.multimodal

import java.nio.ByteBuffer

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Multimodal plumbing: real header parsing (PNG/GIF/BMP/JPEG/WAV crafted
  * byte-level), stub-codec determinism, frame-explode shape.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(33)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    buf.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes)
    buf.putShort(w.toShort).putShort(h.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.position(18); buf.putInt(w).putInt(h)
    buf.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    // SOI, APP0 (16 bytes), SOF0 with dims, EOI
    val buf = ByteBuffer.allocate(2 + 4 + 16 + 2 + 2 + 9 + 2)
    buf.put(0xFF.toByte).put(0xD8.toByte)
    buf.put(0xFF.toByte).put(0xE0.toByte).putShort(18).put(new Array[Byte](16))
    buf.put(0xFF.toByte).put(0xC0.toByte).putShort(11)
    buf.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    buf.put(3.toByte).put(new Array[Byte](3))
    buf.put(0xFF.toByte).put(0xD9.toByte)
    buf.array()
  }

  private def wav(sampleRate: Int, channels: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes).putInt(0)
    buf.array()
  }

  private val schema = StructType(Seq(
    StructField("media_id", LongType), StructField("payload", BinaryType)))

  test("header-level metadata extraction across formats") {
    val df = spark.createDataFrame(Seq(
      Row(1L, png(640, 480)), Row(2L, gif(320, 200)), Row(3L, bmp(100, 50)),
      Row(4L, jpeg(1920, 1080)), Row(5L, wav(44100, 2)),
      Row(6L, "not media".getBytes)).asJava, schema)
    val meta = Multimodal.withMediaMeta(df, "payload")
      .select("media_id", "meta.format", "meta.width", "meta.height",
        "meta.sample_rate", "meta.channels")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(meta(1L) == ("png", Some(640), Some(480), None, None))
    assert(meta(2L) == ("gif", Some(320), Some(200), None, None))
    assert(meta(3L) == ("bmp", Some(100), Some(50), None, None))
    assert(meta(4L) == ("jpeg", Some(1920), Some(1080), None, None))
    assert(meta(5L) == ("wav", None, None, Some(44100), Some(2)))
    assert(meta(6L)._1 == "unknown")
  }

  test("stub codec: deterministic resize + frame explode shape + embeddings") {
    val df = spark.createDataFrame(Seq(
      Row(1L, png(8, 8)), Row(2L, gif(4, 4))).asJava, schema)
    val resized = Multimodal.resizeImages(df, "payload", 64, 64)
      .select("media_id", "payload_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // deterministic across runs
    val resized2 = Multimodal.resizeImages(df, "payload", 64, 64)
      .select("media_id", "payload_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(resized == resized2)
    assert(resized(1L) != resized(2L))

    val frames = Multimodal.sampleFrames(df, "payload", 3)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() == 6)
    assert(frames.filter("media_id = 1").select("frame_idx")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))

    val emb = Multimodal.embedMedia(df, "payload", 16)
      .selectExpr("size(embedding)").collect().map(_.getInt(0))
    assert(emb.forall(_ == 16))
  }
}
