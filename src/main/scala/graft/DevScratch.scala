package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  *
  * Current probe (r14, VERDICT #7 — q138's hash-walk cost): does a
  * repartition+sortWithinPartitions+localCheckpoint layout actually
  * carry its partitioning/ordering into a downstream equi-join's plan
  * (no Exchange/Sort on the checkpointed side), with and without AQE?
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val hv = (1L to 100000L).map(i => (i % 977, i, i * 31)).toDF("d", "q", "h")
      .repartition(8, col("d"), col("q"))
      .sortWithinPartitions("d", "q")
      .localCheckpoint()
    println("== hv.queryExecution.executedPlan.outputPartitioning / ordering ==")
    println(hv.queryExecution.executedPlan.outputPartitioning)
    println(hv.queryExecution.executedPlan.outputOrdering)

    val probe = (1L to 5000L).map(i => (i % 977, i % 997, i)).toDF("doc_a", "p_a", "lcp")
      .hint("shuffle_hash")
    val ha = hv.select(col("d").as("doc_a"), col("q").as("qa"), col("h").as("ha"))
    val j = probe.join(ha, probe("doc_a") === ha("doc_a") &&
      (probe("p_a") + probe("lcp")) === ha("qa")).drop(ha("doc_a"))
    j.write.format("noop").mode("overwrite").save()
    println("== join plan (AQE final) ==")
    println(j.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
