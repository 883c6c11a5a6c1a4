package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Headline set = the queries that exercise the heavy paths (shuffle
  * aggregation, multi-join, windows, LSH dedup, vector search). q24 (the
  * deliberately O(n²) brute-force Jaccard oracle) is excluded — q25 is the
  * scale path for the same semantics and IS measured.
  *
  * Each query is fully materialized via a noop write (count() could skip
  * projection work under column pruning).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders",
    "q04_dedup_keepfirst", "q09_left_join_enrich", "q14_multikey_sort",
    "q16_hourly_rollup", "q17_sessionization", "q18_json_extract",
    "q19_dedup_exact", "q20_token_stats", "q21_quality_score",
    "q22_langid", "q25_minhash_lsh", "q26_simhash",
    "q27_knn_brute", "q28_embed_stats", "q29_ann_lsh",
    "q30_embed_neardup", "q31_set_ops", "q32_rollup", "q33_asof_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: run every headline plan once at the smallest SF so
    // the timed pass measures the engine, not JIT + codegen compilation
    // (measured: q25 21.7s cold vs 2.6s warm on identical data).
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
      headline.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => }
        }
      }
    }
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
