package graft.multimodal

import graft.functions.Hashing

/** Deterministic synthetic media payloads for the multimodal operator
  * queries (q157–q159). This container ships no image/audio corpora and
  * the brief mandates a deterministic fake at the CONTENT boundary —
  * but only there: the bytes produced here are REAL containers (PNG and
  * JPEG via `javax.imageio`, RIFF/AVI chunk lists, PCM16 WAV), so the
  * decode side ([[Multimodal]]/[[Audio]]) exercises exactly the parsers
  * production payloads would hit, and the Spark-side plumbing (binary
  * columns, per-row codec UDFs, frame explodes, metadata structs) is
  * fully real.
  *
  * Everything is a pure function of the seed: procedural pixel
  * patterns, seed-derived sine parameters, seed-derived frame colors.
  * ImageIO's PNG/JPEG encoders are deterministic within a JVM build,
  * which is the scope the golden-parquet oracles need (goldens are
  * generated and verified in the same container).
  */
object MediaSynth {

  /** Real PNG: a seeded two-axis gradient with per-channel slopes, so
    * different seeds give different pixel content (and pixel hashes)
    * while staying compressible.
    */
  def gradientPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val s1 = Hashing.splitmix64(seed)
    val s2 = Hashing.splitmix64(s1)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * (1 + (s1 & 7)) + y * (1 + ((s1 >> 3) & 7)) + (s1 >>> 56)) & 0xff
        val g = (x * (1 + (s2 & 7)) + y * (1 + ((s2 >> 3) & 7)) + (s2 >>> 56)) & 0xff
        val b = (x + y + (s1 >>> 48)) & 0xff
        img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PCM16 mono WAV: a seed-parameterized sine (frequency,
    * amplitude) with a silent tail on every third seed — enough
    * variation that duration / RMS / zero-cross / silence-ratio all
    * move with the seed.
    */
  def sineWav(seed: Long, sampleRate: Int = 8000): Array[Byte] = {
    val s = Hashing.splitmix64(seed)
    val freq = 100.0 + java.lang.Math.floorMod(s, 12L) * 30.0
    val amp = 0.2 + java.lang.Math.floorMod(s >> 8, 5L) * 0.15
    val toneN = sampleRate / 4 // 0.25 s
    val tailN = if (java.lang.Math.floorMod(s >> 16, 3L) == 0L) sampleRate / 8 else 0
    val samples = new Array[Short](toneN + tailN)
    var i = 0
    while (i < toneN) {
      samples(i) =
        (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toShort
      i += 1
    }
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  /** Real MJPEG-AVI: `frames` solid-color JPEG frames (color from the
    * seed and frame index) inside a RIFF/LIST/movi chunk walk — the
    * container shape [[Multimodal.AviMjpeg]] parses.
    */
  def mjpegAvi(seed: Long, frames: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val frameBytes = (0 until frames).map { i =>
      val rgb = (Hashing.splitmix64(seed + 31L * i) & 0xffffffL).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frameBytes.toArray.flatMap(f => riffChunk("00dc", f))
    riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ riffChunk("LIST", movi))
  }

  /** Undecodable bytes — the mixed-corpus reality every operator must
    * stay total over (routes to the stub codec / null features).
    */
  def junk(seed: Long): Array[Byte] =
    s"opaque-media-$seed-${Hashing.splitmix64(seed)}".getBytes("UTF-8")
}
