package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries aggregate: the guarantees that make the sketch a SOUND
  * candidate filter (q71) — estimates never exceed truth, undercount is
  * bounded by n/width, and every true heavy hitter survives. Exercised
  * at widths far below the distinct-key count so decrements and merge
  * rescaling genuinely fire across Spark's partial/final aggregation.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokens = graft.Tables.documents(spark, dir)
    .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))

  private def exactCounts: Map[String, Long] = tokens
    .groupBy("tok").count().collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates are lower bounds within n/width; heavy hitters survive") {
    val exact = exactCounts
    val n = exact.values.sum
    val width = 8 // far below the vocab size → decrements happen
    val sketch = tokens.agg(MisraGries(spark, col("tok"), width).as("mg"))
      .head().getMap[String, Long](0)
    assert(sketch.nonEmpty && sketch.size <= width - 1)
    sketch.foreach { case (k, est) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est <= truth, s"$k: estimate $est above truth $truth")
      assert(est >= truth - n / width,
        s"$k: estimate $est below truth $truth - n/width ${truth - n / width}")
    }
    // the survival guarantee: count > n/width ⇒ present in the sketch
    exact.foreach { case (k, c) =>
      if (c > n / width)
        assert(sketch.contains(k), s"heavy hitter $k (count $c) dropped")
    }
  }

  test("width above the distinct count makes the sketch exact") {
    val exact = exactCounts
    val sketch = tokens
      .agg(MisraGries(spark, col("tok"), exact.size * 2 + 2).as("mg"))
      .head().getMap[String, Long](0)
    assert(sketch == exact)
  }

  test("composes with streaming aggregation state across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mg-stream")
      .toFile.getAbsolutePath
    val toks = tokens
    val n = toks.count()
    // two files → two micro-batches; the sketch buffer must merge
    // across them through the streaming state store
    toks.limit((n / 2).toInt).write.parquet(s"$tmp/b1")
    toks.exceptAll(toks.limit((n / 2).toInt)).write.parquet(s"$tmp/b2")
    val stream = spark.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*")
    val q = stream.groupBy()
      .agg(MisraGries(spark, col("tok"), 1000).as("mg"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("mg_stream_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mg_stream_out")
      .head().getMap[String, Long](0)
    assert(streamed == exactCounts) // width > vocab → sketch is exact
  }

  test("SQL surface via GraftExtensions registration") {
    tokens.createOrReplaceTempView("mg_toks")
    MisraGries.register(spark)
    val m = spark.sql(
      "SELECT graft_heavy_hitters(tok, 1000) AS mg FROM mg_toks")
      .head().getMap[String, Long](0)
    assert(m == exactCounts)
  }
}
