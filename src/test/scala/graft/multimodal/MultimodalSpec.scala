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

  // a REAL image: deterministic gradient, encoded via ImageIO
  private def realImage(w: Int, h: Int, fmt: String,
                        invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(1, w - 1) + y * 255 / math.max(1, h - 1)) / 2
      val p = if (invert) 255 - v else v
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("ImageIoCodec decodes a real PNG: resize produces real scaled pixels") {
    val bytes = realImage(32, 32, "png")
    assert(Multimodal.sniffFormat(bytes) == "png")
    val resized = Multimodal.ImageIoCodec.resize(bytes, 4, 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back != null && back.getWidth == 4 && back.getHeight == 4)
    // nearest-neighbor: out(x,y) = in(x*32/4, y*32/4) — check a corner
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert((back.getRGB(3, 3) & 0xffffff) == (src.getRGB(24, 24) & 0xffffff))
    // deterministic
    assert(Multimodal.ImageIoCodec.resize(bytes, 4, 4).toSeq == resized.toSeq)
  }

  test("embed runs on real pixels: gradient vs inverse differ, constant is flat") {
    val grad = Multimodal.ImageIoCodec.embed(realImage(32, 32, "png"), 16)
    val inv = Multimodal.ImageIoCodec.embed(
      realImage(32, 32, "png", invert = true), 16)
    assert(grad.length == 16 && grad.forall(v => v >= 0f && v <= 1f))
    assert(grad.toSeq != inv.toSeq)
    // gradient brightens left→right: first cell darker than last
    assert(grad.head < grad.last)
    // inverted image mirrors that
    assert(inv.head > inv.last)
  }

  test("pixelHash is container-invariant: same pixels as PNG and BMP collide") {
    val pngB = realImage(16, 16, "png")
    val bmpB = realImage(16, 16, "bmp")
    assert(pngB.toSeq != bmpB.toSeq) // different bytes on disk...
    assert(Multimodal.ImageIoCodec.pixelHash(pngB) ==
      Multimodal.ImageIoCodec.pixelHash(bmpB)) // ...same decoded content
    assert(Multimodal.ImageIoCodec.pixelHash(pngB) !=
      Multimodal.ImageIoCodec.pixelHash(realImage(16, 16, "png", invert = true)))
    // the Spark-side operator dedups across containers
    val df = spark.createDataFrame(Seq(
      Row(1L, pngB), Row(2L, bmpB),
      Row(3L, realImage(16, 16, "png", invert = true))).asJava, schema)
    val groups = Multimodal.withPixelHash(df, "payload")
      .groupBy("pixel_hash").count().collect().map(_.getLong(1)).sorted
    assert(groups.toSeq == Seq(1L, 2L))
  }

  test("undecodable payloads fall back to the stub per record") {
    val junk = "definitely not an image".getBytes
    assert(Multimodal.ImageIoCodec.resize(junk, 8, 8).toSeq ==
      Multimodal.StubCodec.resize(junk, 8, 8).toSeq)
    assert(Multimodal.ImageIoCodec.embed(junk, 4).toSeq ==
      Multimodal.StubCodec.embed(junk, 4).toSeq)
    assert(Multimodal.ImageIoCodec.pixelHash(junk) ==
      Multimodal.StubCodec.pixelHash(junk))
  }

  test("real single-frame PNG yields exactly one frame; mixed media keeps stub shape") {
    val df = spark.createDataFrame(
      Seq(Row(1L, realImage(8, 8, "png"))).asJava, schema)
    val frames = Multimodal.sampleFrames(df, "payload", 3).collect()
    assert(frames.length == 1) // honest: one frame exists, not n fakes
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames.head.getAs[Array[Byte]]("frame")))
    assert(decoded.getWidth == 8 && decoded.getHeight == 8)
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
