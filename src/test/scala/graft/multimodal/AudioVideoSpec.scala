package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real sample-level audio (WAV/PCM decode + curation features +
  * gain-invariant fingerprint) and real MJPEG-AVI video frame access —
  * all against containers synthesized in-test, so every byte of the
  * parse path is exercised without fixture files.
  */
class AudioVideoSpec extends AnyFunSuite {

  // ---- WAV synthesis -------------------------------------------------

  private def wav16(sampleRate: Int, channels: Int,
                    samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def sine(sr: Int, hz: Double, seconds: Double,
                   amp: Double): Array[Short] =
    Array.tabulate((sr * seconds).toInt)(i =>
      (math.sin(2 * math.Pi * hz * i / sr) * amp * 32767).toShort)

  test("WAV PCM16 decode: rate, duration, normalized samples") {
    val sr = 8000
    val p = Audio.decodeWav(wav16(sr, 1, sine(sr, 440, 1.0, 0.5))).get
    assert(p.sampleRate == sr && p.channels == 1 && p.bitsPerSample == 16)
    assert(p.samples.length == sr)
    val f = Audio.features(p)
    assert(f.duration_s == 1.0)
    // 440 Hz sine: 2 zero crossings per cycle
    assert(math.abs(f.zero_cross_rate - 2.0 * 440 / sr) < 0.01)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(f.silence_ratio == 0.0 && f.clipping_ratio == 0.0)
  }

  test("stereo mixes to mono; half-silent clip reports ~0.5 silence") {
    val sr = 8000
    val tone = sine(sr, 200, 0.5, 0.8)
    val silent = new Array[Short](sr / 2)
    // stereo interleave: L = tone-then-silence, R identical
    val mono = tone ++ silent
    val stereo = mono.flatMap(s => Array(s, s))
    val p = Audio.decodeWav(wav16(sr, 2, stereo)).get
    assert(p.channels == 2 && p.samples.length == sr)
    val f = Audio.features(p)
    assert(math.abs(f.silence_ratio - 0.5) < 0.05)
    // full-scale square wave clips; this tone must not
    assert(f.clipping_ratio == 0.0)
  }

  test("features flag clipping on a full-scale square wave") {
    val sr = 8000
    val square = Array.tabulate(sr)(i =>
      (if ((i / 100) % 2 == 0) 32767 else -32768).toShort)
    val f = Audio.features(Audio.decodeWav(wav16(sr, 1, square)).get)
    assert(f.clipping_ratio > 0.99 && f.peak >= 0.999)
  }

  test("fingerprint is invariant to volume scaling, differs across content") {
    val sr = 8000
    // amplitude-modulated tone so the energy contour is non-trivial
    def clip(seed: Int, amp: Double): Array[Short] = {
      val r = new scala.util.Random(seed)
      val env = Array.fill(65)(0.2 + 0.8 * r.nextDouble())
      Array.tabulate(sr) { i =>
        val e = env(i * 65 / sr)
        (math.sin(2 * math.Pi * 300 * i / sr) * e * amp * 20000).toShort
      }
    }
    val loud = Audio.fingerprint(Audio.decodeWav(wav16(sr, 1, clip(1, 1.0))).get)
    val quiet = Audio.fingerprint(Audio.decodeWav(wav16(sr, 1, clip(1, 0.25))).get)
    val other = Audio.fingerprint(Audio.decodeWav(wav16(sr, 1, clip(2, 1.0))).get)
    assert(loud == quiet, "gain change must not move the fingerprint")
    assert(loud != other, "different content must fingerprint differently")
    val silence = Audio.decodeWav(wav16(sr, 1, new Array[Short](sr))).get
    assert(Audio.fingerprint(silence) == 0L)
  }

  test("decode is total: non-WAV, truncated, and compressed-format bytes -> None") {
    assert(Audio.decodeWav("not audio".getBytes).isEmpty)
    val good = wav16(8000, 1, sine(8000, 100, 0.1, 0.5))
    assert(Audio.decodeWav(java.util.Arrays.copyOf(good, 30)).isEmpty)
    val mulaw = good.clone() // format code 7 (mu-law): no JVM decoder
    mulaw(20) = 7
    assert(Audio.decodeWav(mulaw).isEmpty)
  }

  test("Spark audio columns: features + fingerprint, null for undecodable") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sr = 8000
    val a = wav16(sr, 1, sine(sr, 440, 0.25, 0.5))
    val junk = "mp3-pretend".getBytes
    val df = Seq((1L, a), (2L, junk)).toDF("id", "payload")
    val rows = Audio.withAudioFingerprint(
        Audio.withAudioFeatures(df, "payload"), "payload")
      .orderBy("id")
      .select("id", "audio.duration_s", "audio_fp").collect()
    assert(rows(0).getDouble(1) == 0.25 && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  // ---- AVI synthesis -------------------------------------------------

  private def jpegFrame(rgb: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f))
    val list = chunk("LIST", movi)
    val form = "AVI ".getBytes("US-ASCII") ++ list
    chunk("RIFF", form)
  }

  test("MJPEG-AVI: container walk finds every frame; sampling is even and real") {
    val colors = Seq(0xFF0000, 0x00FF00, 0xFFFFFF, 0x0000FF)
    val avi = mjpegAvi(colors.map(jpegFrame(_)))
    assert(Multimodal.sniffFormat(avi) == "avi")
    val frames = Multimodal.AviMjpeg.extractJpegFrames(avi)
    assert(frames.length == 4)
    assert(frames.forall(f => Multimodal.sniffFormat(f) == "jpeg"))

    // sample 2 of 4 -> first and last, decoded + re-encoded as PNG
    val sampled = Multimodal.AviAwareCodec.sampleFrames(avi, 2)
    assert(sampled.length == 2)
    assert(sampled.forall(f => Multimodal.sniffFormat(f) == "png"))
    def dominantChannel(png: Array[Byte]): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val rgb = img.getRGB(img.getWidth / 2, img.getHeight / 2)
      Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff).zipWithIndex.maxBy(_._1)._2
    }
    assert(dominantChannel(sampled.head) == 0) // red first frame
    assert(dominantChannel(sampled.last) == 2) // blue last frame
  }

  test("AVI embed averages real frames; pixelHash is frame-content keyed") {
    val aviA = mjpegAvi(Seq(jpegFrame(0x102030), jpegFrame(0x405060)))
    val aviB = mjpegAvi(Seq(jpegFrame(0x102030), jpegFrame(0x405060)))
    val aviC = mjpegAvi(Seq(jpegFrame(0x708090), jpegFrame(0xA0B0C0)))
    assert(Multimodal.AviAwareCodec.pixelHash(aviA) ==
      Multimodal.AviAwareCodec.pixelHash(aviB))
    assert(Multimodal.AviAwareCodec.pixelHash(aviA) !=
      Multimodal.AviAwareCodec.pixelHash(aviC))
    val e = Multimodal.AviAwareCodec.embed(aviA, 16)
    assert(e.length == 16 && e.exists(_ > 0f))
    // non-AVI routes through the image codec unchanged
    val png = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB), "png", out)
      out.toByteArray
    }
    assert(Multimodal.AviAwareCodec.pixelHash(png) ==
      Multimodal.ImageIoCodec.pixelHash(png))
  }

  test("non-MJPEG AVI falls back to the stub deterministically") {
    // a 'movi' list whose video chunk is NOT a JPEG (e.g. raw bits)
    val avi = {
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
        bb.array()
      }
      val movi = "movi".getBytes("US-ASCII") ++ chunk("00dc", Array[Byte](1, 2, 3, 4))
      chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi))
    }
    assert(Multimodal.AviMjpeg.extractJpegFrames(avi).isEmpty)
    val s1 = Multimodal.AviAwareCodec.sampleFrames(avi, 2)
    val s2 = Multimodal.StubCodec.sampleFrames(avi, 2)
    assert(s1.map(_.toSeq) == s2.map(_.toSeq))
  }
}
