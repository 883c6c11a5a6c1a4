package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries aggregate: the guarantees that make the sketch a SOUND
  * candidate filter (q71) — estimates never exceed truth, undercount is
  * bounded by n/(width−1) (the batch-decrement bound; the classic
  * n/width does NOT hold, pinned by the adversarial test below), and
  * every key above that bound survives. Exercised at widths far below
  * the distinct-key count so decrements and merge rescaling genuinely
  * fire across Spark's partial/final aggregation.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokens = graft.Tables.documents(spark, dir)
    .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))

  private def exactCounts: Map[String, Long] = tokens
    .groupBy("tok").count().collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates are lower bounds within n/(width-1); heavy hitters survive") {
    val exact = exactCounts
    val n = exact.values.sum
    val width = 8 // far below the vocab size → decrements happen
    val sketch = tokens.agg(MisraGries(spark, col("tok"), width).as("mg"))
      .head().getMap[String, Long](0)
    assert(sketch.nonEmpty && sketch.size <= width - 1)
    val bound = n / (width - 1)
    sketch.foreach { case (k, est) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est <= truth, s"$k: estimate $est above truth $truth")
      assert(est >= truth - bound,
        s"$k: estimate $est below truth $truth - n/(width-1) ${truth - bound}")
    }
    // the survival guarantee: count > n/(width-1) ⇒ present in the sketch
    exact.foreach { case (k, c) =>
      if (c > bound)
        assert(sketch.contains(k), s"heavy hitter $k (count $c) dropped")
    }
  }

  test("adversarial stream: batch decrement erodes n/width but honors n/(width-1)") {
    // Repeated blocks of 3 keys x 10 occurrences then 1 fresh key: the
    // fresh arrival finds the buffer full at min=10 and wipes it, so
    // each recurring key is undercounted by 10 per block — more than
    // n/width allows, within what n/(width-1) allows. This is the
    // counterexample to the classic bound under batch decrementing.
    import spark.implicits._
    val width = 4
    val blocks = 20
    val rows = (0 until blocks).flatMap { i =>
      Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c") ++
        Seq(s"fresh_$i")
    }
    val n = rows.size.toLong // 31 per block
    // single partition so arrival order is exactly the block order
    val sketch = rows.toDS().coalesce(1).toDF("tok")
      .agg(MisraGries(spark, col("tok"), width).as("mg"))
      .head().getMap[String, Long](0)
    val truthA = 10L * blocks
    val estA = sketch.getOrElse("a", 0L)
    assert(estA <= truthA)
    assert(estA >= truthA - n / (width - 1),
      s"est $estA below truth $truthA - n/(width-1) ${truthA - n / (width - 1)}")
    // and the demonstration that the OLD documented bound is violated:
    assert(estA < truthA - n / width,
      "expected the adversarial stream to break the n/width bound " +
        "(if this fails, the eviction strategy changed — re-derive the bound)")
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
    // two files → two micro-batches; the sketch buffer must merge
    // across them through the streaming state store. Split on a stable
    // row hash (NOT limit(), which is unordered and evaluated
    // independently per job, so two limit() calls can pick different
    // rows and lose/duplicate tokens between the halves).
    toks.filter(crc32(col("tok")) % 2 === 0).write.parquet(s"$tmp/b1")
    toks.filter(crc32(col("tok")) % 2 =!= 0).write.parquet(s"$tmp/b2")
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
