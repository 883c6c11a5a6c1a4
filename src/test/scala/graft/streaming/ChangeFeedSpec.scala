package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MV change feed: per-batch deltas are exact, cumulative
  * state equals a whole-stream recompute, and state versions rotate.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("change feed emits exact added/changed rows; state = full recompute") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user", LongType), StructField("v", LongType)))
    val tmp = Files.createTempDirectory("changefeed").toFile.getAbsolutePath
    def write(path: String, rows: Row*): Unit =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.parquet(path)
    // batch 1: users 1 (2 rows) and 2; batch 2: users 2 and 3
    write(s"$tmp/src/b1", Row(1L, 10L), Row(1L, 5L), Row(2L, 7L))
    write(s"$tmp/src/b2", Row(2L, 3L), Row(3L, 4L))

    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, String, Option[Long], Option[Long])]]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val q = ChangeFeed.streamingChangeFeed(
      stream, s"$tmp/state", Seq("user"),
      Seq(("cnt", "sum"), ("total", "sum")),
      batch => batch.groupBy("user")
        .agg(count(lit(1)).as("cnt"), sum("v").as("total")),
      checkpoint = s"$tmp/ckpt") { df =>
      perBatch += df.collect().map(r => (
        r.getLong(r.fieldIndex("batch_id")),
        r.getLong(r.fieldIndex("user")),
        r.getString(r.fieldIndex("change")),
        Option(r.get(r.fieldIndex("old_cnt"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("new_cnt"))).map(_.asInstanceOf[Long]))).toSet
    }
    q.processAllAvailable()
    q.stop()

    assert(perBatch == Seq(
      Set((0L, 1L, "added", None, Some(2L)), (0L, 2L, "added", None, Some(1L))),
      Set((1L, 2L, "changed", Some(1L), Some(2L)),
        (1L, 3L, "added", None, Some(1L)))))

    // one surviving state version, equal to a whole-stream recompute
    val versions = new java.io.File(s"$tmp/state").listFiles()
      .filter(_.getName.startsWith("v"))
    assert(versions.length == 1)
    val state = spark.read.parquet(versions.head.getAbsolutePath)
      .collect().map(r => (r.getLong(r.fieldIndex("user")),
        r.getLong(r.fieldIndex("cnt")), r.getLong(r.fieldIndex("total")))).toSet
    assert(state == Set((1L, 2L, 15L), (2L, 2L, 10L), (3L, 1L, 4L)))
  }
}
