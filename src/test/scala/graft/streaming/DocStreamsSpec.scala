package graft.streaming

import java.nio.file.Files

import graft.{Tables, TestSpark}
import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch streaming near-dup detection: the flatMapGroupsWithState
  * operator must pair a document against bucket occupants from EARLIER
  * micro-batches — the semantics no built-in streaming aggregate has.
  */
class DocStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming segment dedup drops a segment re-seen in a later micro-batch") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // doc 1: segments A(8 toks) + B(4-tok tail). doc 2 (later batch):
    // repeats segment A verbatim as its first 8 tokens, then novel C.
    val segA = "a b c d e f g h"
    val tail = "x y z w"
    val segC = "p q r s t u v n"
    val tmp = Files.createTempDirectory("segdedup").toFile.getAbsolutePath
    spark.createDataFrame(
      Seq(Row(1L, s"$segA $tail", t(0))).asJava, schema)
      .write.parquet(s"$tmp/src/b1")
    spark.createDataFrame(
      Seq(Row(2L, s"$segA $segC", t(1))).asJava, schema)
      .write.parquet(s"$tmp/src/b2")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val q = DocStreams.streamingSegmentDedup(stream, "doc_id", "text", "ts")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("segdedup_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("segdedup_out").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    // doc 1 contributes A and tail; doc 2's repeat of A is DROPPED
    // (cross-batch state), its novel segment C survives.
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Set((1L, h(segA)), (1L, h(tail)), (2L, h(segC))))
  }

  test("streaming source quota admits across batches until the cap, then drops") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType)))
    val tmp = Files.createTempDirectory("quota").toFile.getAbsolutePath
    // batch 1: three s1 docs against a quota of 2 -> lowest two ids admitted
    spark.createDataFrame(
      Seq(Row(30L, "s1"), Row(10L, "s1"), Row(20L, "s1")).asJava, schema)
      .coalesce(1).write.parquet(s"$tmp/src/b1")
    Thread.sleep(20) // distinct mod times so the file source orders batches
    // batch 2: s1 is already full -> both dropped; s2 has room
    spark.createDataFrame(
      Seq(Row(5L, "s1"), Row(40L, "s1"), Row(7L, "s2")).asJava, schema)
      .coalesce(1).write.parquet(s"$tmp/src/b2")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val q = DocStreams.streamingSourceQuota(stream, "doc_id", "source", n = 2)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("quota_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batch-1 admissions are ranked by docId; batch-2's s1 arrivals find
    // the quota exhausted even though doc 5 has a smaller id (streams
    // can't revisit earlier admissions); s2 starts its own budget.
    assert(got == Set(("s1", 10L, 1L), ("s1", 20L, 2L), ("s2", 7L, 1L)))
  }

  test("streaming dedupAgainst: batch-2 dups of batch-1 history are dropped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten"
    val fresh = "totally unrelated content with its own distinct vocabulary"
    val tmp = Files.createTempDirectory("dedupagainst").toFile.getAbsolutePath
    def write(path: String, rows: Row*): Unit =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.parquet(path)
    // batch 1: A and B become history; batch 2: exact dup of A,
    // near-dup of B (one token appended), and a fresh doc
    write(s"$tmp/src/b1", Row(1L, textA), Row(2L, textB))
    write(s"$tmp/src/b2",
      Row(3L, textA), Row(4L, s"$textB eleven"), Row(5L, fresh))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var batchNo = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val q = DocStreams.streamingDedupAgainst(
      stream, s"$tmp/history", "doc_id", "text",
      k = 3, threshold = 0.5, checkpoint = s"$tmp/ckpt",
      sink = df => {
        batchNo += 1
        val b = batchNo
        seen ++= df.select("doc_id").collect().map(r => (b, r.getLong(0)))
      })
    q.processAllAvailable()
    q.stop()
    val byBatch = seen.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(1L) == Set(1L, 2L)) // empty history: both survive
    // exact dup (3) and near-dup (4) die against the history; 5 survives
    assert(byBatch(2L) == Set(5L), s"got $byBatch")
    // and the history now holds exactly the survivors
    val hist = spark.read.parquet(s"$tmp/history")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hist == Set(1L, 2L, 5L))
  }

  test("near-dup pair spanning micro-batches is detected via bucket state") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val brutePairs = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brutePairs.nonEmpty)
    val (pairA, pairB) = brutePairs.head

    // batch 1: everything except pairB; batch 2: only pairB — the pair
    // can only be found if batch-1 signatures survive in state.
    val tmp = Files.createTempDirectory("docstream").toFile.getAbsolutePath
    docs.filter(s"doc_id != $pairB").write.parquet(s"$tmp/src/b1")
    docs.filter(s"doc_id = $pairB").write.parquet(s"$tmp/src/b2")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val out = DocStreams.streamingNearDupCandidates(
      stream, "doc_id", "text", k = 3, estThreshold = 0.5)
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("neardup_stream").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("neardup_stream")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every brute-force near-dup surfaces as a candidate (128-perm
    // estimate of J>=0.7 clears the 0.5 bar w.h.p.), including the pair
    // split across batches
    assert(got.contains((math.min(pairA, pairB), math.max(pairA, pairB))))
    assert(brutePairs.subsetOf(got))
  }

  test("streaming embedding near-dup: exact cosines, pair spans batches") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val brute = graft.queries.EmbeddingQueries.q30(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(brute.nonEmpty)
    val (pairA, pairB) = brute.keys.head

    val tmp = Files.createTempDirectory("embstream").toFile.getAbsolutePath
    emb.filter(s"vec_id != $pairB").write.parquet(s"$tmp/src/b1")
    emb.filter(s"vec_id = $pairB").write.parquet(s"$tmp/src/b2")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val out = DocStreams.streamingEmbedNearDup(
      stream, "vec_id", "embedding", threshold = 0.45)
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("embdup_stream").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("embdup_stream")
      .dropDuplicates("vec_a", "vec_b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every batch-truth pair surfaces (4x64 banding: per-pair miss <1e-5),
    // including the one split across batches, with BIT-IDENTICAL cosines
    // (same double fold as the codegen expression)
    assert(got.contains((pairA, pairB)))
    brute.foreach { case (k, cos) =>
      assert(got.contains(k), s"missing pair $k")
      assert(got(k) == cos, s"cosine mismatch for $k")
    }
  }

  test("TTL-bounded state still pairs within the window") {
    // Same scenario through the ProcessingTimeTimeout code path: with a
    // TTL far larger than the run, behavior is identical (eviction timing
    // itself is the engine's processing-time contract, not testable
    // deterministically here).
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val brutePairs = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (pairA, pairB) = brutePairs.head
    val tmp = Files.createTempDirectory("docstream-ttl").toFile.getAbsolutePath
    docs.filter(s"doc_id != $pairB").write.parquet(s"$tmp/src/b1")
    docs.filter(s"doc_id = $pairB").write.parquet(s"$tmp/src/b2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val out = DocStreams.streamingNearDupCandidates(
      stream, "doc_id", "text", k = 3, estThreshold = 0.5,
      stateTtl = Some(java.time.Duration.ofHours(1)))
    // AvailableNow, not processAllAvailable: with ProcessingTimeTimeout
    // the engine keeps scheduling timeout-eviction batches, so a
    // default-trigger query never reports "all available" — drain and stop.
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("neardup_ttl").start()
    q.awaitTermination(120000)
    q.stop()
    val got = spark.table("neardup_ttl")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((math.min(pairA, pairB), math.max(pairA, pairB))))
  }
}
