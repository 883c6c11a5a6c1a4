package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Bucketed interval join vs the brute-force inequality join it
  * replaces: identical pairs on adversarial data (boundary hits,
  * intervals spanning many bins, nested/overlapping intervals,
  * degenerate end < start).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private val pointSchema = StructType(Seq(
    StructField("k", LongType), StructField("pid", LongType),
    StructField("ts", TimestampType)))
  private val ivSchema = StructType(Seq(
    StructField("k", LongType), StructField("iid", LongType),
    StructField("lo", TimestampType), StructField("hi", TimestampType)))

  test("matches brute-force inequality join on adversarial fixtures") {
    val hour = 3600L * 1000000L
    val points = Seq(
      Row(1L, 1L, ts(0L)),             // exact interval start
      Row(1L, 2L, ts(2 * hour)),       // exact interval end
      Row(1L, 3L, ts(hour)),           // interior; in two overlapping intervals
      Row(1L, 4L, ts(10 * hour)),      // in no interval
      Row(2L, 5L, ts(hour)),           // same time, other key
      Row(2L, 6L, ts(50 * hour)))      // inside a many-bin interval
    val intervals = Seq(
      Row(1L, 10L, ts(0L), ts(2 * hour)),        // [0, 2h]
      Row(1L, 11L, ts(hour / 2), ts(3 * hour)),  // overlaps 10
      Row(2L, 12L, ts(hour), ts(hour)),          // degenerate single point
      Row(2L, 13L, ts(0L), ts(100 * hour)),      // spans 200 bins at 30min
      Row(2L, 14L, ts(5 * hour), ts(4 * hour)))  // end < start: dropped
    val p = spark.createDataFrame(points.asJava, pointSchema)
    val iv = spark.createDataFrame(intervals.asJava, ivSchema)

    val got = RangeJoin.intervalJoin(p, iv, "k", "ts", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = p.as("p").join(iv.as("i"),
        col("p.k") === col("i.k") &&
          unix_micros(col("p.ts")).between(
            unix_micros(col("i.lo")), unix_micros(col("i.hi"))) &&
          unix_micros(col("i.hi")) >= unix_micros(col("i.lo")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(brute == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L),
      (5L, 12L), (5L, 13L), (6L, 13L)))
  }

  test("randomized: bucketed join equals the plain-Scala reference at several bin widths") {
    import org.scalacheck.Gen
    val us = Gen.choose(0L, 4L * 3600L * 1000000L) // 0..4h
    val pointGen = Gen.zip(Gen.choose(1L, 3L), us)
    val ivGen = Gen.zip(Gen.choose(1L, 3L), us, us)
    val caseGen = Gen.zip(
      Gen.listOfN(40, pointGen), Gen.listOfN(20, ivGen),
      Gen.oneOf(60L, 600L, 1800L, 7200L))
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    for (_ <- 1 to 6) {
      caseGen(params, seed).foreach { case (pts, ivs, binSec) =>
        val points = pts.zipWithIndex.map { case ((k, t), i) => Row(k, i.toLong, ts(t)) }
        val intervals = ivs.zipWithIndex.map { case ((k, a, b), i) =>
          Row(k, i.toLong, ts(a), ts(b))
        }
        val p = spark.createDataFrame(points.asJava, pointSchema)
        val iv = spark.createDataFrame(intervals.asJava, ivSchema)
        val got = RangeJoin.intervalJoin(p, iv, "k", "ts", "lo", "hi", binSec)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // plain-Scala reference at ms precision (ts() truncates to ms)
        val expected = (for {
          ((pk, pt), pi) <- pts.zipWithIndex
          ((ik, lo, hi), ii) <- ivs.zipWithIndex
          if pk == ik && lo / 1000 <= hi / 1000 &&
            pt / 1000 >= lo / 1000 && pt / 1000 <= hi / 1000
        } yield (pi.toLong, ii.toLong)).toSet
        assert(got == expected, s"binWidthSec=$binSec")
      }
      seed = seed.next
    }
  }

  test("no duplicate pairs when an interval spans many bins") {
    val minute = 60L * 1000000L
    val p = spark.createDataFrame(Seq(Row(1L, 1L, ts(90 * minute))).asJava, pointSchema)
    val iv = spark.createDataFrame(
      Seq(Row(1L, 10L, ts(0L), ts(600 * minute))).asJava, ivSchema)
    val rows = RangeJoin.intervalJoin(p, iv, "k", "ts", "lo", "hi", binWidthSec = 60L)
      .collect()
    assert(rows.length == 1)
  }

  test("stream-static: streamed points joined to static intervals match the batch join") {
    val hour = 3600L * 1000000L
    val points = Seq(
      Row(1L, 1L, ts(hour)), Row(1L, 2L, ts(5 * hour)), Row(2L, 3L, ts(hour)))
    val intervals = Seq(
      Row(1L, 10L, ts(0L), ts(2 * hour)), Row(2L, 11L, ts(0L), ts(2 * hour)))
    val p = spark.createDataFrame(points.asJava, pointSchema)
    val iv = spark.createDataFrame(intervals.asJava, ivSchema)
    val dir = java.nio.file.Files.createTempDirectory("rj-stream").toFile.getAbsolutePath
    p.write.parquet(s"$dir/pts")

    // the interval side is static (dimension-table shape): the bucketed
    // rewrite is an ordinary stream-static equi-join — fully supported,
    // no state, no watermark needed
    val stream = spark.readStream.schema(p.schema).parquet(s"$dir/pts")
    val q = RangeJoin.intervalJoin(stream, iv, "k", "ts", "lo", "hi")
      .select("pid", "iid")
      .writeStream.outputMode("append").format("memory")
      .queryName("rj_stream_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rj_stream_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = RangeJoin.intervalJoin(p, iv, "k", "ts", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch == Set((1L, 10L), (3L, 11L)))
  }

  test("refreshed interval join picks up intervals added between micro-batches") {
    val hour = 3600L * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("rj-refresh")
      .toFile.getAbsolutePath
    val ivDir = s"$dir/iv"
    // interval table v1: only interval 10 on key 1
    spark.createDataFrame(
        Seq(Row(1L, 10L, ts(0L), ts(2 * hour))).asJava, ivSchema)
      .write.parquet(s"$ivDir/v1")
    // batch-1 points: pid 1 inside interval 10; pid 2 inside the SPAN of
    // the not-yet-existing interval 20 — must match nothing yet
    spark.createDataFrame(
        Seq(Row(1L, 1L, ts(hour)), Row(2L, 2L, ts(hour))).asJava, pointSchema)
      .write.parquet(s"$dir/pts/b1")

    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val stream = spark.readStream.schema(pointSchema).parquet(s"$dir/pts/*")
    val q = RangeJoin.streamingIntervalJoinRefreshed(
      stream, () => spark.read.parquet(s"$ivDir/*"), "k", "ts", "lo", "hi",
      s"$dir/ckpt", joined => joined.select("pid", "iid").collect()
        .foreach(r => out.add((r.getLong(0), r.getLong(1)))))
    q.processAllAvailable()
    assert(out.asScala.toSet == Set((1L, 10L)))

    // the dimension grows: interval 20 appears; batch-2 point pid 3 in it
    spark.createDataFrame(
        Seq(Row(2L, 20L, ts(0L), ts(2 * hour))).asJava, ivSchema)
      .write.parquet(s"$ivDir/v2")
    spark.createDataFrame(
        Seq(Row(2L, 3L, ts(hour))).asJava, pointSchema)
      .write.parquet(s"$dir/pts/b2")
    q.processAllAvailable()
    q.stop()
    // batch 2 joined against the refreshed table (a static-DF join frozen
    // at start would still see only interval 10); pid 2 is not retro-matched
    assert(out.asScala.toSet == Set((1L, 10L), (3L, 20L)))
  }
}
