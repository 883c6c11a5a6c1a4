package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min aggregate: the properties q152 leans on — estimates never
  * undercount, overcount is bounded by e/w·n across ALL keys (the CMS
  * guarantee holds per-key w.h.p.; with d=4 independent rows the whole
  * small-vocab corpus satisfies it deterministically here), and the
  * sketch is a commutative SUM — bit-identical under repartitioning and
  * under per-batch build + merge (the streaming composition), which is
  * what lets q152's oracle replay the estimates exactly.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val depth = 4
  private val width = 64 // far below vocab size → real collisions

  private def tokens = graft.Tables.documents(spark, dir)
    .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(CountMin(spark, col("tok"), depth, width).as("cms"))
      .head().getSeq[Long](0).toArray

  test("estimates are upper bounds; overcount within e/w * n") {
    val exact = tokens.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val sketch = sketchOf(tokens)
    assert(sketch.length == depth * width)
    assert(sketch.grouped(width).forall(_.sum == n)) // each row counts every arrival
    val eps = math.E / width
    exact.foreach { case (k, truth) =>
      val est = CountMin.estimate(sketch, k, depth, width)
      assert(est >= truth, s"$k: estimate $est below truth $truth")
      assert(est <= truth + math.ceil(eps * n).toLong,
        s"$k: overcount ${est - truth} above e/w*n ${eps * n}")
    }
    // absent keys estimate only collision mass (still bounded)
    val ghost = CountMin.estimate(sketch, "never-a-token-xyz", depth, width)
    assert(ghost <= math.ceil(eps * n).toLong)
  }

  test("sketch is partition-invariant and merge-composable (streaming shape)") {
    val one = sketchOf(tokens)
    assert(sketchOf(tokens.repartition(13)).sameElements(one),
      "sketch must not depend on partitioning")
    // per-batch sketches added into persistent state == whole-stream sketch
    val a = sketchOf(tokens.filter(md5(col("tok")) < lit("8")))
    val b = sketchOf(tokens.filter(md5(col("tok")) >= lit("8")))
    assert(a.indices.map(i => a(i) + b(i)).toArray.sameElements(one),
      "batchwise build + elementwise add must equal the one-pass sketch")
  }

  test("bucket convention matches the DuckDB replay (md5_number_upper % w)") {
    // CountMin.bucket must agree with the in-plan md5Num expression used
    // by q152 (and hence with DuckDB's md5_number_upper replay).
    val keys = Seq("the", "a", "ünïcodé", "", "row scan")
    import spark.implicits._
    val viaExpr = keys.toDF("k")
      .select((0 until depth).map(r =>
        pmod(VectorFns.md5Num(concat(lit(s"cms$r:"), col("k"))),
          lit(width)).cast("int").as(s"b$r")): _*)
      .collect()
    keys.zip(viaExpr).foreach { case (k, row) =>
      (0 until depth).foreach { r =>
        assert(row.getInt(r) == CountMin.bucket(k, r, width),
          s"bucket mismatch for '$k' row $r")
      }
    }
  }

  test("SQL registration via GraftExtensions name works") {
    CountMin.register(spark)
    tokens.createOrReplaceTempView("cms_toks")
    val arr = spark.sql(
      s"SELECT graft_count_min(tok, $depth, $width) FROM cms_toks")
      .head().getSeq[Long](0)
    assert(arr.toArray.sameElements(sketchOf(tokens)))
  }
}
