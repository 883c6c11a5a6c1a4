package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
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
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(name: String, d: String): Unit =
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
    for (q <- Seq("q137_suffix_array", "q138_longest_dup_substring", "q140_tfidf_neardup")) {
      time(s"$q warm(sf0.001)")(run(q, "/root/testdata/sf0.001"))
    }
    for (i <- 1 to 2; q <- Seq("q137_suffix_array", "q138_longest_dup_substring", "q140_tfidf_neardup")) {
      time(s"$q pass$i")(run(q, dir))
    }
    val nMatches = SparkEntry.queries("q140_tfidf_neardup")(spark, dir).count()
    println(s"[scratch] q140 matches: $nMatches")
    val docs = Tables.documents(spark, dir)
    val (u, cand) = graft.operators.Apss.prefixCandidates(docs, 0.6, "doc_id", "text")
    val nCand = cand.count()
    println(f"[scratch] q140 candidates: $nCand (ratio ${nCand.toDouble / nMatches}%.1f:1)")
    spark.stop()
  }
}
