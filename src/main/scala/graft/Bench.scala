package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Headline set = the queries that exercise the heavy paths (shuffle
  * aggregation, multi-join, windows, LSH dedup, vector search). q24 (the
  * deliberately O(n²) brute-force Jaccard oracle) is excluded — q25 is the
  * scale path for the same semantics and IS measured. Likewise q30 (the
  * all-pairs embedding near-dup oracle) is excluded in favor of q36, its
  * LSH-bucketed scale path.
  *
  * Robustness (the r2/r3 artifacts were poisoned by machine contention —
  * different queries spiked each round with byte-identical plans):
  *  - THREE timed passes, per-query minimum reported. A transient CPU
  *    spike hits one pass; the min is the engine's actual cost (r4's
  *    recorded q01 was 5.6 s across both of two passes under driver-side
  *    contention vs 1.3 s warm on a quiet machine).
  *  - the JSON line is also written to `SPARK_GRAFT_BENCH_OUT` if set, so
  *    the driver parses a file instead of scraping sbt-prefixed stdout.
  *  - per-query shuffle bytes (read+write) via SparkListener: plan
  *    regressions (new exchanges) are visible even when wall-clock noise
  *    isn't, and shuffle volume is the metric that predicts 100 TB cost.
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
    "q35_simhash_neardup", "q36_embed_neardup_lsh",
    "q31_set_ops", "q32_rollup", "q33_asof_join", "q38_dedup_clusters",
    "q39_subqueries", "q40_sliding_window",
    "q42_stratified_sample", "q43_corpus_stats", "q44_repetition_stats",
    "q45_vocab_df", "q47_decontaminate", "q48_pack_offsets",
    "q50_segment_dedup", "q51_unigram_logprob", "q52_filter_funnel",
    "q53_topk_per_group", "q54_global_shuffle",
    "q55_sketches", "q56_event_deltas", "q57_pivot", "q58_cube",
    "q59_bm25", "q60_interval_join", "q61_exact_k_sample",
    "q62_running_total", "q63_chunking", "q64_label_cohesion",
    "q65_attribution_join", "q66_bloom_decontaminate", "q67_funnel",
    "q68_weighted_sample", "q69_cohort_retention", "q70_bpe_pair_counts",
    "q71_heavy_hitters", "q72_temperature_mixing", "q73_source_dup_matrix",
    "q74_hybrid_rerank", "q75_adaptive_filter", "q76_trailing_rate",
    "q77_event_paths", "q78_topk_native", "q79_share_of_user",
    "q80_group_zscore", "q81_token_ids", "q82_winnow_dedup",
    "q83_bpe_train", "q84_bpe_encode", "q85_pack_bpe",
    "q86_bigram_logprob", "q87_source_quota", "q88_dup_pagerank",
    "q89_char_entropy", "q90_contamination_rate", "q91_canonical_pick",
    "q92_kmeans", "q93_top_ngram_frac", "q94_mix_resample",
    "q95_segment_rebuild", "q96_embed_whiten",
    "q97_kmeans_seeded", "q98_kmeans_minibatch", "q99_semantic_dedup",
    "q100_int8_quantize", "q101_nb_classifier", "q102_zorder_code",
    "q103_data_audit", "q104_robust_stats", "q105_srp_project",
    "q106_incremental_agg", "q107_fuzzy_join", "q108_scd2_build",
    "q109_profile", "q110_triangle_count", "q111_kneser_ney",
    "q112_minhash_doph", "q113_kmv_overlap", "q114_fuzzy_lookup",
    "q115_equidepth_hist", "q116_cdc_apply", "q117_pmi_collocations",
    "q118_sorted_neighborhood", "q119_robust_outliers",
    "q120_markov_transitions", "q121_containment_dedup",
    "q122_tfidf_keywords", "q123_doc_novelty", "q124_indoc_dedup",
    "q125_snapshot_diff", "q126_dup_substring_coverage",
    "q127_dup_substring_cut", "q128_hard_negatives",
    "q129_quality_ensemble")

  /** Accumulates shuffle read+write bytes across all tasks; snapshot the
    * counter around a query to attribute its shuffle volume (queries run
    * sequentially and are fully materialized, so deltas don't interleave).
    */
  private final class ShuffleBytesListener extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten +
          m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

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
    val shuffle = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(shuffle)

    // A failed query must NEVER look like a fast success (round 7: 13
    // broken queries were recorded as ~0.06 s / 0-shuffle-byte wins with
    // rc=0). runOne reports failure; timed passes record -1 for any query
    // that failed in any pass, and the JSON carries an explicit errors key.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def runOne(name: String, dir: String): Boolean =
      SparkEntry.queries.get(name) match {
        case None =>
          // an unregistered headline name must fail loudly, not record
          // a ~0s/0-shuffle "success" (the round-7 artifact-lie mode)
          System.err.println(s"[bench] $name is not in SparkEntry.queries")
          false
        case Some(fn) =>
          try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
      }

    // Untimed warmup: run every headline plan once at the smallest SF so
    // the timed passes measure the engine, not JIT + codegen compilation
    // (measured: q25 21.7s cold vs 2.6s warm on identical data).
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
      headline.foreach(runOne(_, warmupDir))

    def timedPass(): Seq[(String, Double, Long)] = headline.map { name =>
      val b0 = shuffle.bytes.get()
      val t0 = System.nanoTime()
      val ok = runOne(name, sfDir)
      if (!ok) failed += name
      (name, (System.nanoTime() - t0) / 1e9, shuffle.bytes.get() - b0)
    }
    val passes = Seq.fill(3)(timedPass())
    val results = passes.transpose.map { samples =>
      val name = samples.head._1
      if (failed.contains(name)) (name, -1.0, -1L)
      else (name, samples.map(_._2).min, samples.map(_._3).min)
    }

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sb = results.map { case (k, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_bytes":$sb,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // Durability: ALWAYS persist to a repo-local file too — round 6's
    // driver artifact was tail-truncated (the JSON line outgrew the
    // driver's stdout tail capture, `parsed: null`), so the numbers
    // must never exist only on stdout.
    val outPaths = Seq("bench_out.json") ++ sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outPaths.foreach { path =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
