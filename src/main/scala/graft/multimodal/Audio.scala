package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL audio sample-level support — pure-JVM WAV/PCM decoding (RIFF
  * chunk walk + sample conversion, no codec library) feeding the
  * curation signals an audio training pipeline filters on: duration,
  * RMS level, peak, zero-crossing rate, silence ratio, clipping ratio —
  * the audio analog of q21's text-quality ratios. Formats beyond
  * WAV/PCM (mp3, aac, opus) have no stock-JVM decoder and keep the
  * documented [[Multimodal.StubCodec]] fallback at the operator level
  * (`features`/`fingerprint` return None and the column is null — a
  * mixed-media partition never fails the task).
  *
  * Fingerprint: a 64-bit energy-contour signature (sign of successive
  * frame-energy deltas — the time-domain simplification of the
  * Haitsma–Kalker band-energy fingerprint). Deterministic, and
  * INVARIANT TO VOLUME SCALING (scaling multiplies every frame energy
  * by the same factor, preserving every delta's sign), so the same
  * recording at different gains dedups together — the property the
  * spec pins.
  */
object Audio {

  /** Decoded mono audio: samples normalized to [-1, 1]. */
  final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Float])

  final case class AudioFeatures(duration_s: Double, rms: Double,
      peak: Double, zero_cross_rate: Double, silence_ratio: Double,
      clipping_ratio: Double)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decode WAV → mono float samples. Handles PCM integer (8-bit
    * unsigned, 16/24/32-bit signed little-endian, format code 1) and
    * IEEE float32 (format code 3); channels are mean-mixed to mono.
    * Returns None for non-WAV bytes, compressed WAV variants, or a
    * truncated/malformed chunk list.
    */
  def decodeWav(b: Array[Byte]): Option[Pcm] = {
    if (Multimodal.sniffFormat(b) != "wav") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (code, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      if (id == "fmt " && len >= 16)
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12),
          le16(b, i + 22)))
      if (id == "data") data = Some((i + 8, len))
      i += 8 + len + (len & 1)
    }
    for {
      (code, ch, rate, bits) <- fmt
      (off, len) <- data
      if ch >= 1 && rate > 0
      bytesPer = bits / 8
      if bytesPer >= 1 && len >= ch * bytesPer
      samples <- (code, bits) match {
        case (1, 8)  => Some(decodeInt(b, off, len, ch, 1))
        case (1, 16) => Some(decodeInt(b, off, len, ch, 2))
        case (1, 24) => Some(decodeInt(b, off, len, ch, 3))
        case (1, 32) => Some(decodeInt(b, off, len, ch, 4))
        case (3, 32) => Some(decodeF32(b, off, len, ch))
        case _ => None // compressed / exotic: no JVM decoder
      }
    } yield Pcm(rate, ch, bits, samples)
  }

  private def decodeInt(b: Array[Byte], off: Int, len: Int,
                        ch: Int, bytesPer: Int): Array[Float] = {
    val frame = ch * bytesPer
    val n = len / frame
    val out = new Array[Float](n)
    val full = (1L << (8 * bytesPer - 1)).toFloat
    var f = 0
    while (f < n) {
      var sum = 0.0f
      var c = 0
      while (c < ch) {
        val i = off + f * frame + c * bytesPer
        // 8-bit WAV is unsigned-biased; wider widths are signed LE
        val v =
          if (bytesPer == 1) ((b(i) & 0xff) - 128) << 24
          else {
            var acc = 0
            var k = 0
            while (k < bytesPer) { acc |= (b(i + k) & 0xff) << (8 * k); k += 1 }
            acc << (8 * (4 - bytesPer))
          }
        sum += (v >> (8 * (4 - bytesPer))).toFloat / full
        c += 1
      }
      out(f) = sum / ch
      f += 1
    }
    out
  }

  private def decodeF32(b: Array[Byte], off: Int, len: Int,
                        ch: Int): Array[Float] = {
    val bb = java.nio.ByteBuffer.wrap(b, off, len)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = len / (4 * ch)
    val out = new Array[Float](n)
    var f = 0
    while (f < n) {
      var sum = 0.0f
      var c = 0
      while (c < ch) { sum += bb.getFloat(off + (f * ch + c) * 4); c += 1 }
      out(f) = sum / ch
      f += 1
    }
    out
  }

  /** Curation signals over decoded samples. Silence ratio = fraction of
    * 20 ms windows with RMS below `silenceRms`; clipping ratio =
    * fraction of samples at ≥ 0.999 absolute amplitude.
    */
  def features(p: Pcm, silenceRms: Double = 0.01): AudioFeatures = {
    val n = p.samples.length
    if (n == 0) return AudioFeatures(0, 0, 0, 0, 1.0, 0)
    var sumSq = 0.0; var peak = 0.0; var zc = 0; var clipped = 0
    var i = 0
    while (i < n) {
      val v = p.samples(i)
      sumSq += v.toDouble * v
      val a = math.abs(v.toDouble)
      if (a > peak) peak = a
      if (a >= 0.999) clipped += 1
      if (i > 0 && (v > 0) != (p.samples(i - 1) > 0)) zc += 1
      i += 1
    }
    val win = math.max(1, p.sampleRate / 50) // 20 ms
    var silent = 0; var nWin = 0
    var w = 0
    while (w < n) {
      val end = math.min(n, w + win)
      var s = 0.0
      var j = w
      while (j < end) { s += p.samples(j).toDouble * p.samples(j); j += 1 }
      if (math.sqrt(s / (end - w)) < silenceRms) silent += 1
      nWin += 1
      w += win
    }
    AudioFeatures(
      duration_s = n.toDouble / p.sampleRate,
      rms = math.sqrt(sumSq / n),
      peak = peak,
      zero_cross_rate = zc.toDouble / n,
      silence_ratio = silent.toDouble / nWin,
      clipping_ratio = clipped.toDouble / n)
  }

  /** 64-bit energy-contour fingerprint: 65 frames of equal sample
    * count, bit k = sign(E(k+1) − E(k)). Volume-scaling invariant; an
    * all-silent clip fingerprints to 0.
    */
  def fingerprint(p: Pcm): Long = {
    val frames = 65
    val n = p.samples.length
    if (n < frames) return 0L
    val e = new Array[Double](frames)
    var k = 0
    while (k < frames) {
      val a = k * n / frames
      val b = math.max(a + 1, (k + 1) * n / frames)
      var s = 0.0
      var i = a
      while (i < b) { s += p.samples(i).toDouble * p.samples(i); i += 1 }
      e(k) = s / (b - a)
      k += 1
    }
    var fp = 0L
    k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) fp |= (1L << k)
      k += 1
    }
    fp
  }

  // ---- Spark operators ----------------------------------------------

  /** Audio-feature struct column over a binary WAV column (null for
    * undecodable payloads — total over mixed media).
    */
  def extractAudioFeatures(bin: Column): Column = {
    val u = udf { b: Array[Byte] => decodeWav(b).map(features(_)) }
    u(bin)
  }

  def withAudioFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("audio", extractAudioFeatures(col(binCol)))

  /** Gain-invariant fingerprint column — the audio dedup key (feed to
    * an exact-dedup groupBy like Dedup.exactGroups; null = undecodable).
    */
  def withAudioFingerprint(df: DataFrame, binCol: String): DataFrame = {
    val u = udf { b: Array[Byte] =>
      decodeWav(b).map(p => java.lang.Long.valueOf(fingerprint(p))).orNull
    }
    df.withColumn("audio_fp", u(col(binCol)))
  }
}
