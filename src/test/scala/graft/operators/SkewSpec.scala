package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation / salted join equal their unsalted plans. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("saltedAggregate equals plain groupBy for algebraic aggregates") {
    val li = Tables.lineitem(spark, dir)
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), salts = 7, Seq(
      Skew.SaltedSum("l_quantity", "sq"), Skew.SaltedCount("n"),
      Skew.SaltedMin("l_orderkey", "mn"), Skew.SaltedMax("l_orderkey", "mx")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val plain = li.groupBy("l_returnflag").agg(
      sum("l_quantity").as("sq"), count(lit(1)).as("n"),
      min("l_orderkey").as("mn"), max("l_orderkey").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // l_quantity values are integral doubles → sums exact in any order
    assert(salted == plain)
  }

  test("adaptiveSaltedAggregate: hot keys detected and salted, result exact") {
    import spark.implicits._
    // one key owns ~90% of rows; the rest are a long light tail
    val hot = (1 to 9000).map(i => ("hot", i.toLong))
    val tail = (1 to 1000).map(i => (s"k${i % 200}", i.toLong))
    val df = (hot ++ tail).toDF("k", "v")
    val aggs = Seq(Skew.SaltedSum("v", "sv"), Skew.SaltedCount("n"),
      Skew.SaltedMin("v", "mn"), Skew.SaltedMax("v", "mx"))
    val adaptive = Skew.adaptiveSaltedAggregate(df, Seq("k"), salts = 8, aggs,
      heavyFraction = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val plain = Skew.plainAggregate(df, Seq("k"), aggs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(adaptive == plain && plain.contains("hot") && plain.size == 201)
  }

  test("adaptiveSaltedAggregate with no hot keys falls back to the plain plan") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"k${i % 400}", i.toLong)).toDF("k", "v")
    val aggs = Seq(Skew.SaltedCount("n"))
    val adaptive = Skew.adaptiveSaltedAggregate(df, Seq("k"), salts = 8, aggs,
      heavyFraction = 0.05)
    // uniform 400-key data: nothing clears the 5% cutoff → single plain agg
    // (no union in the plan), and values still match
    assert(!adaptive.queryExecution.executedPlan.toString.contains("Union"))
    val got = adaptive.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Skew.plainAggregate(df, Seq("k"), aggs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain)
  }

  test("saltedJoin equals plain join") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    val salted = Skew.saltedJoin(o, c, "o_custkey", salts = 5)
      .select("o_orderkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    val plain = o.join(c, Seq("o_custkey"), "left")
      .select("o_orderkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(salted == plain)
  }
}
