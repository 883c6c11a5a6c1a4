package graft.plans

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The RangeJoinRewrite optimizer rule: a naive inequality join written
  * by a user must silently become the bucketed hash equi-join (same
  * pairs as graft.operators.RangeJoin.intervalJoin, no nested-loop
  * operator in the physical plan), and the rewrite must be inert when
  * disabled or when the shape doesn't match.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  private val pointSchema = StructType(Seq(
    StructField("k", LongType), StructField("pid", LongType),
    StructField("ts", TimestampType)))
  private val ivSchema = StructType(Seq(
    StructField("k", LongType), StructField("iid", LongType),
    StructField("lo", TimestampType), StructField("hi", TimestampType)))

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def fixtures(spark: SparkSession): (DataFrame, DataFrame) = {
    val hour = 3600L * 1000000L
    val points = (0 until 200).map { i =>
      Row((i % 5).toLong, i.toLong, ts(i * hour / 4))
    }
    val intervals = (0 until 40).map { i =>
      Row((i % 5).toLong, (1000 + i).toLong,
        ts(i * hour), ts(i * hour + 3 * hour / 2))
    } :+ Row(3L, 9999L, ts(10 * hour), ts(9 * hour)) // reversed span
    (spark.createDataFrame(points.asJava, pointSchema),
      spark.createDataFrame(intervals.asJava, ivSchema))
  }

  test("naive inequality join is rewritten to a hash join with identical pairs") {
    withExtSession { spark =>
      val (p, iv) = fixtures(spark)
      val naive = p.join(iv,
        p("k") === iv("k") && p("ts") >= iv("lo") && p("ts") <= iv("hi"))
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.linesIterator.take(12).mkString("\n"))
      assert(plan.contains("__graft_bin")) // the rewrite, not some other plan

      val got = naive.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = graft.operators.RangeJoin.intervalJoin(
          p, iv, "k", "ts", "lo", "hi")
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == reference && got.nonEmpty)
    }
  }

  test("residual predicates and swapped sides still rewrite correctly") {
    withExtSession { spark =>
      val (p, iv) = fixtures(spark)
      // intervals on the LEFT, extra residual conjunct, mirrored bounds
      val naive = iv.join(p,
        iv("k") === p("k") && iv("lo") <= p("ts") && iv("hi") >= p("ts")
          && p("pid") % 2 === 0)
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      val got = naive.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = graft.operators.RangeJoin.intervalJoin(
          p, iv, "k", "ts", "lo", "hi")
        .filter(org.apache.spark.sql.functions.col("pid") % 2 === 0)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == reference && got.nonEmpty)
    }
  }

  test("naive q65-style attribution join on real events matches the operator") {
    withExtSession { spark =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("click_end"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      // the naive form a user would write
      val naive = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_end"))
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      val got = naive.select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = graft.queries.EventQueries
        .q65(spark, "/root/testdata/sf0.001")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == reference && got.nonEmpty)
    }
  }

  test("sentinel end dates take the fallback branch, results exact") {
    withExtSession { spark =>
      val (p, iv0) = fixtures(spark)
      // SCD-style open intervals: valid_to = 9999-12-31 spans ~1.4e8
      // bins at the default width. Pre-guard, Sequence would allocate a
      // ~1 GB array PER ROW; the guard routes these to the fallback
      // theta join and keeps the short intervals on the bucketed path.
      val sentinelHi = ts(253402214400000000L) // 9999-12-31 00:00:00 UTC
      val sentinels = (0 until 3).map { i =>
        Row(i.toLong, (2000 + i).toLong, ts(0L), sentinelHi)
      }
      val iv = iv0.union(spark.createDataFrame(sentinels.asJava, ivSchema))
      val naive = p.join(iv,
        p("k") === iv("k") && p("ts") >= iv("lo") && p("ts") <= iv("hi"))
      val plan = naive.queryExecution.optimizedPlan.toString
      assert(plan.contains("Union"), plan.linesIterator.take(8).mkString("\n"))
      assert(plan.contains("__graft_bin"))
      // exact MULTISET compare against the un-rewritten join — catches
      // both missed pairs and a row double-counted by the two branches
      val got = naive.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
      spark.conf.set("spark.graft.rangeJoin.rewrite", "false")
      val want = try {
        p.join(iv,
          p("k") === iv("k") && p("ts") >= iv("lo") && p("ts") <= iv("hi"))
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
      } finally spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
      assert(got == want)
      assert(got.exists(_._2 == 2000)) // sentinel intervals really match
    }
  }

  test("maxBinsPerInterval=0 routes everything through the fallback, still exact") {
    withExtSession { spark =>
      spark.conf.set("spark.graft.rangeJoin.maxBinsPerInterval", "0")
      try {
        val (p, iv) = fixtures(spark)
        val naive = p.join(iv,
          p("k") === iv("k") && p("ts") >= iv("lo") && p("ts") <= iv("hi"))
        val got = naive.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
        val reference = graft.operators.RangeJoin.intervalJoin(
            p, iv, "k", "ts", "lo", "hi")
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
        assert(got == reference && got.nonEmpty)
      } finally
        spark.conf.set("spark.graft.rangeJoin.maxBinsPerInterval", "10000")
    }
  }

  test("disabled flag leaves the naive plan untouched") {
    withExtSession { spark =>
      spark.conf.set("spark.graft.rangeJoin.rewrite", "false")
      try {
        val (p, iv) = fixtures(spark)
        val naive = p.join(iv,
          p("k") === iv("k") && p("ts") >= iv("lo") && p("ts") <= iv("hi"))
        val plan = naive.queryExecution.executedPlan.toString
        assert(!plan.contains("__graft_bin"))
      } finally spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    }
  }

  test("plain equi-joins and non-timestamp ranges are not touched") {
    withExtSession { spark =>
      val (p, iv) = fixtures(spark)
      val equi = p.join(iv, Seq("k"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bin"))
      val numeric = p.join(iv, p("k") === iv("k") && p("pid") >= iv("iid"))
      assert(!numeric.queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }
}
