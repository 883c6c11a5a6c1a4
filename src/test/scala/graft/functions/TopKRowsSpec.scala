package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKRows bounded-heap aggregate: exact parity with the window
  * rank-filter plan it replaces, correctness across the partial/merge
  * path, struct-key round-trip through serialization, and the plan
  * property that makes it matter — no Window, no pre-shuffle Sort.
  */
class TopKRowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q78 equals the q53 window form exactly") {
    val native = graft.queries.CorpusQueries.q78(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val window = graft.queries.CorpusQueries.q53(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(native.nonEmpty && native.sameElements(window))
  }

  test("heap survives the partial/merge path across many partitions") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i % 7).toString, (i * 37 % 4999).toLong))
      .toDF("g", "v").repartition(16)
    val got = df
      .groupBy("g").agg(TopKRows(spark, col("v"), 5).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val expected = (1 to 5000).map(i => ((i % 7).toString, (i * 37 % 4999).toLong))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(5).toSeq).toMap
    assert(got == expected)
  }

  test("plan has no Window and no Sort below the exchange") {
    val p = graft.queries.CorpusQueries.q78(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(p.contains("ObjectHashAggregate")) // the typed-imperative path
  }

  test("composes with streaming aggregation state across micro-batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tk-stream")
      .toFile.getAbsolutePath
    // global smallest-3 must combine values split across two micro-batches
    Seq(50L, 9L, 40L).toDF("v").write.parquet(s"$tmp/b1")
    Seq(7L, 60L, 21L).toDF("v").write.parquet(s"$tmp/b2")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("v BIGINT"))
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*")
    val q = stream.groupBy()
      .agg(TopKRows(spark, col("v"), 3).as("top"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tk_stream_out").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("tk_stream_out").head().getSeq[Long](0) == Seq(7L, 9L, 21L))
  }

  test("SQL surface via registration") {
    TopKRows.register(spark)
    import spark.implicits._
    Seq(5L, 3L, 9L, 1L, 7L).toDF("v").createOrReplaceTempView("tk_vals")
    val got = spark.sql("SELECT graft_top_k(v, 2) AS t FROM tk_vals")
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 3L))
  }
}
