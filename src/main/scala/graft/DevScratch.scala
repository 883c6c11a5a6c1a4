package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  *
  * Current probe: the contraction-CC round count on the shuffled
  * diameter-1024 chain (the OperatorsSpec deep-chain graph).
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 1025
    val perm = new scala.util.Random(7).shuffle((0 until n).toVector)
    val edges = (0 until n - 1)
      .map(i => (perm(i).toLong, perm(i + 1).toLong)).toDF("src", "dst")
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val t0 = System.nanoTime()
    val got = graft.operators.Dedup
      .connectedComponents(edges, vertices, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"[scratch] CC chain: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"rounds=${graft.operators.Dedup.lastDistributedRounds.get()}, " +
      s"correct=${got.size == n && got.values.forall(_ == 0L)}")
    spark.stop()
  }
}
