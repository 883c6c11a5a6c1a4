package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement runner for local iteration (not part of the
  * driver contract).
  *
  * Current probe (r14): the decade-2 rehearsal shows q145/q148/q121/
  * q126/q127 shuffle-write bytes growing 19–420× in the 10×→100×
  * decade while q110/q114/q137/q149 stay at ~10×. Run a query at two
  * tiers and print EVERY exchange's written bytes from the executed
  * plan's metrics, so the exploding node is named instead of guessed.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q145_dedup_sweep"
    val tiers = if (args.length > 1) args.drop(1).toSeq
      else Seq("scale/sf1", "scale/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dumpExchanges(plan: org.apache.spark.sql.execution.SparkPlan): Unit = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            val wb = e.metrics.get("shuffleBytesWritten")
              .orElse(e.metrics.get("bytesWritten"))
              .orElse(e.metrics.get("dataSize")).map(_.value).getOrElse(-1L)
            println(f"[exch] ${wb / 1e6}%12.1f MB  <- ${e.child.simpleStringWithNodeId().take(110)}")
            e.children.foreach(walk)
          case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
            val ds = e.metrics.get("dataSize").map(_.value).getOrElse(-1L)
            println(f"[bcast] ${ds / 1e6}%11.1f MB  <- ${e.child.simpleStringWithNodeId().take(110)}")
            e.children.foreach(walk)
          case other => other.children.foreach(walk)
        }
      }
      walk(plan)
    }

    for (dir <- tiers) {
      println(s"==== $name @ $dir ====")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
      dumpExchanges(df.queryExecution.executedPlan)
      graft.operators.TransientPersists.releaseAll()
    }
    spark.stop()
  }
}
