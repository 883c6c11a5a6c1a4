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
}
