package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound and algebra properties for the KMV/theta sketch:
  * estimate accuracy, exactness below k, partition-invariance of the
  * merge, and the intersection estimator vs planted overlap.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val k = 1024

  test("estimate within 4 RSE of truth at 50k distinct; exact below k") {
    import spark.implicits._
    val n = 50000
    val sk = (1 to n).map(i => s"tok_$i").toDF("t")
      .agg(KmvSketch(spark, col("t"), k)).collect()(0)
      .getSeq[Long](0)
    val est = KmvSketch.estimate(sk, k)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) / n < 4 * rse, s"est $est vs $n")
    // below k: the sketch IS the set
    val small = (1 to 500).map(i => s"s_$i").toDF("t")
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    assert(KmvSketch.estimate(small, k) == 500.0)
  }

  test("merge is partition-invariant: 1 vs 16 partitions give identical sketches") {
    import spark.implicits._
    val rows = (1 to 20000).map(i => s"tok_${i % 7000}")
    val one = rows.toDF("t").coalesce(1)
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    val many = rows.toDF("t").repartition(16)
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    assert(one == many)
  }

  test("intersection estimate tracks planted overlap") {
    import spark.implicits._
    // A = 1..30000, B = 20001..50000 -> true overlap 10000
    val a = (1 to 30000).map(i => s"x_$i").toDF("t")
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    val b = (20001 to 50000).map(i => s"x_$i").toDF("t")
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    val est = KmvSketch.intersectionEstimate(a, b, k)
    // intersection RSE is governed by the overlap's share of the union:
    // |A∩B|/|A∪B| = 0.2 -> allow a generous 5x base RSE band
    assert(math.abs(est - 10000) / 10000.0 < 5 * (1.0 / math.sqrt(k - 2.0)),
      s"intersection est $est vs 10000")
    // disjoint sets estimate ~0 (far below the planted-overlap band)
    val c = (1 to 30000).map(i => s"y_$i").toDF("t")
      .agg(KmvSketch(spark, col("t"), k)).collect()(0).getSeq[Long](0)
    assert(KmvSketch.intersectionEstimate(a, c, k) < 1000)
  }
}
