package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed join: the bucket-key equi-join must plan with NO
  * shuffle exchange on either side (the write-once-shuffle contract).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join elides both exchanges and matches the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "o_custkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val n = joined.count() // materialize so AQE finalizes the plan
      def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
        case s: ShuffleExchangeExec => true
        case other => other.children.exists(hasShuffle)
      }
      assert(!hasShuffle(joined.queryExecution.executedPlan),
        "bucketed join should not shuffle")
      val plain = orders.join(customer, Seq("o_custkey")).count()
      assert(n == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("z-ordered layout prunes a 2-D rectangle better than 1-D clustering") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    // enough files that the z-curve's grid is finer than the query
    // rectangle: 64 files ≈ an 8×8 grid over the 2-D domain, vs the
    // 1/8-of-domain rectangle below
    val nFiles = 64
    Bucketing.zOrderedWrite(li, s"$tmp/z", "l_orderkey", "l_partkey", nFiles)
    // 1-D comparison layout: range-clustered on l_orderkey only
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/r")
    // per-file min/max envelopes, as a parquet reader's stats would see
    def envelopes(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_orderkey").as("ko"), max("l_orderkey").as("xo"),
          min("l_partkey").as("kp"), max("l_partkey").as("xp"))
        .collect()
    // a small rectangle in both dims (~1/8 of each domain)
    val (oLo, oHi, pLo, pHi) = (1000L, 2875L, 250L, 500L)
    def touched(path: String): Int = envelopes(path).count { r =>
      r.getLong(1) <= oHi && r.getLong(2) >= oLo &&
        r.getLong(3) <= pHi && r.getLong(4) >= pLo
    }
    val zTouched = touched(s"$tmp/z")
    val rTouched = touched(s"$tmp/r")
    // 1-D layout serves the orderkey predicate only: every file whose
    // orderkey slice intersects must be read (partkey min/max spans the
    // full domain in each). Z-order bounds BOTH dims per file.
    assert(zTouched < rTouched,
      s"z-order touched $zTouched files, 1-D range layout $rTouched")
    // correctness: both layouts return identical rectangle contents
    def rect(path: String) = spark.read.parquet(path)
      .filter(col("l_orderkey").between(oLo, oHi) &&
        col("l_partkey").between(pLo, pHi))
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(rect(s"$tmp/z").sameElements(rect(s"$tmp/r")))
  }
}
