package graft.operators

import graft.functions.{Hashing, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora (SURVEY.md §7.4 extension
  * inventory). Three tiers, in increasing fuzziness:
  *
  *  1. exact       — hash-groupBy on a content digest (one shuffle on the
  *                   digest key; survivors picked by min id — deterministic).
  *  2. minhashLsh  — MinHash + banded LSH candidate generation, then exact
  *                   shingle-Jaccard verification of candidates only. The
  *                   100 TB path: signature computation is shuffle-free,
  *                   banding shuffles (band, bucket) keys only, and the
  *                   verify join touches candidate pairs, not O(n²).
  *  3. jaccardBrute — exact all-pairs shingle Jaccard via cross join; the
  *                   correctness oracle for (2), only viable at test scale.
  *
  * Reference anchor: the reference dedups patron batches exactly by key
  * (/root/reference/lib/pipeline_controller.py:165-181); the fuzzy tiers
  * are the LLM-pipeline extensions required by BASELINE.json.
  */
object Dedup {

  /** Shuffle rounds (hook aggs + compress joins + contraction joins)
    * the most recent [[ccDistributed]] call took. Test instrumentation
    * ONLY: the convergence claim — rounds grow polylogarithmically in
    * component size, never with diameter — is asserted on this counter,
    * because a wall-clock budget flakes under shared-box contention
    * while the round count is a deterministic property of the algorithm
    * (r12 verdict #1: the 120 s guard failed at 193.7 s on unchanged
    * code; instrumenting the loop then exposed the old shortcut's 349
    * rounds on a diameter-1024 chain).
    */
  val lastDistributedRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Exact dedup groups: one row per distinct content digest with the
    * surviving (minimum) id and the group size.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Winnowed document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS fingerprinting algorithm): md5 every stride-1
    * k-gram, then keep the MINIMUM hash in each sliding window of `w`
    * consecutive k-gram hashes, distinct per document. Offset-invariant
    * where fixed-boundary segmentation (q50's mod-k cut) is not: a
    * verbatim passage duplicated at a shifted token offset produces the
    * same k-gram hashes, and the winnowing theorem guarantees any
    * shared run of ≥ w + k − 1 tokens selects at least one common
    * fingerprint — fixed boundaries share NO segment unless the shift
    * happens to be ≡ 0 (mod k). Documents shorter than w + k − 1 tokens
    * fall back to one whole-document window (standard winnowing
    * behavior), so no doc is silently unfingerprintable; docs under k
    * tokens have no k-gram and are dropped.
    *
    * Scale shape: the k-gram hashing and window-min selection run as
    * ONE fused JVM pass per document (map-only, no explode of the
    * stride-1 grams into rows), so the shuffle downstream (group by
    * fingerprint) carries only the selected ~1/w fraction. md5 (not a
    * 64-bit hash) keeps the selection reproducible in any engine for
    * the oracle; min is over the hex string, identical under binary
    * collation.
    */
  def winnowedSegments(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    // Single-pass JVM selection (Hashing.winnowedFingerprints): the
    // two-phase expression form (transform for the k-gram md5 array,
    // transform for window minima) gets the whole hash-array subtree
    // CollapseProject-inlined into every window lambda — O(n²·k) md5
    // calls per doc, measured 207 s at sf0.1 vs ~1 s for this kernel.
    val fpUdf = udf { text: String =>
      graft.functions.Hashing.winnowedFingerprints(text, k, w)
    }
    docs
      .select(col(idCol), explode(fpUdf(col(textCol))).as("fingerprint"))
  }

  /** Corpus-duplicated winnow SPANS — the char-offset tier behind the
    * cross-shard dedup-cut ([[graft.operators.SuffixArray.crossShardDedupCut]]):
    * winnow-select fixed-`minLen`-char grams per doc
    * ([[graft.functions.Hashing.winnowedCharGramSpans]]), then keep
    * every selection site whose fingerprint was selected at ≥ 2
    * distinct (doc, position) sites corpus-wide — i.e. the
    * minLen-char substring at that span provably recurs somewhere (in
    * another doc OR elsewhere in the same doc), regardless of any
    * shard boundary. Output: (idCol, s, e) char spans, 1-based,
    * end-exclusive, each exactly minLen chars.
    *
    * PRECISION is exact by construction (r17 verdict #1): a span is
    * emitted only when its own minLen-char gram recurs (md5 collision
    * aside), so text that is not part of any ≥ minLen-char duplicated
    * substring is never cut — the false-cut rate on a clean corpus is
    * 0 (SuffixArraySpec measures it on a planted clean corpus).
    * RECALL: the winnowing guarantee — any duplicated run of
    * ≥ minLen + w − 1 chars has at least one window fully inside it
    * in both copies, and identical windows select identical grams —
    * so runs past that bound are always cut; runs in
    * [minLen, minLen + w − 2] are cut best-effort (w trades shuffle
    * volume against that gap). A repeat whose second copy sits at an
    * unselected site in the SAME doc can be missed here, but same-doc
    * repeats are same-shard by definition and the exact SA tier cuts
    * them — this tier only needs the cross-shard complement.
    *
    * Scale shape: one map-side UDF pass (the selected ~2/(w+1)
    * fraction of gram positions is all that leaves the mapper), one
    * fingerprint-keyed count, one semi join back — linear, keyed
    * shuffles only. A UDF, not the HOF/expression form, for the same
    * measured reason as [[winnowedSegments]]: the two-phase transform
    * form gets the whole per-position md5 subtree CollapseProject-
    * inlined into every window-min lambda — O(n²·minLen) hashing per
    * doc — and the position-carrying variant only widens that subtree
    * (each selected element must carry (fp, s, e), so the inlining
    * duplicates the tuple construction too). The fused JVM kernel
    * ([[graft.functions.Hashing.winnowedCharGramSpans]]) hashes each
    * gram once and is the plan we'd want on a cluster: map-only,
    * codegen-adjacent, nothing leaves the task but the 2/(w+1)
    * selection.
    */
  def winnowedCharSpans(docs: DataFrame, idCol: String, textCol: String,
                        minLen: Int, w: Int = 8): DataFrame = {
    require(minLen >= 1 && w >= 1, s"minLen and w must be >= 1, got minLen=$minLen w=$w")
    val spanUdf = udf { text: String =>
      graft.functions.Hashing.winnowedCharGramSpans(text, minLen, w)
    }
    val sel = docs
      .select(col(idCol), explode(spanUdf(col(textCol))).as("g"))
      .select(col(idCol), col("g._1").as("fp"),
        col("g._2").as("s"), col("g._3").as("e"))
    val dup = sel.groupBy("fp").agg(count(lit(1)).as("n_sites"))
      .filter(col("n_sites") >= 2).select("fp")
    sel.join(dup, Seq("fp"), "left_semi").select(col(idCol), col("s"), col("e"))
  }

  /** Cross-set EXACT substring decontamination cut — "dedup against
    * the test set" (Lee et al. 2022 §6.1 run train-vs-eval; the
    * decontamination step every LLM pretraining run performs before
    * training): for each non-eval document, every maximal char span
    * whose content overlaps ANY eval document in a run of ≥ `minLen`
    * chars. Exact in both directions, not winnowed: a shared run of
    * length L ≥ minLen contains L − minLen + 1 stride-1 minLen-char
    * grams, ALL present in the eval gram set, so the merged island
    * reconstructs the full run at its exact offsets (recall exact);
    * and a position is cut only when its own minLen-char gram occurs
    * verbatim in the eval set (precision exact, 64-bit-md5 collision
    * aside — P[false site] ≈ |eval grams|/2⁶⁴ per train gram). This is
    * q47's 5-token-gram flag and q66's whole-doc check taken to the
    * dedup-cut family's char-exact contract, and it is cheaper than
    * pushing eval docs through the SA kernel: no suffix sort, no LCP
    * walk — one map pass over each side.
    *
    * Scale shape at 100 TB: eval/benchmark corpora are MBs–GBs while
    * train is the 100 TB side, so the distinct eval gram set (8-byte
    * hashes, ~|eval chars| of them) broadcasts (the q47 benchGrams
    * rule) and the train gram stream — generated map-side by the
    * fused-kernel UDF ([[graft.functions.Hashing.charGramHashes]]),
    * one hash per char position — is filtered IN the map stage by the
    * broadcast semi join: nothing corpus-sized ever shuffles; only
    * matched positions (≈ the contaminated chars) reach the per-doc
    * islands merge. Output: (idCol, cut_start, cut_end), 1-based,
    * end-exclusive, disjoint per doc.
    */
  def evalSubstringCut(docs: DataFrame, idCol: String, textCol: String,
                       isEval: Column, minLen: Int): DataFrame =
    evalSubstringCutAgainst(
      evalGramSet(docs.filter(isEval), textCol, minLen),
      docs.filter(!isEval), idCol, textCol, minLen)

  /** The DISTINCT minLen-char-gram hash set of an eval corpus — the
    * broadcast side of [[evalSubstringCut]], exposed so a long-lived
    * consumer (the streaming gate
    * [[graft.streaming.DocStreams.streamingEvalDecontaminate]]) can
    * materialize it ONCE and probe every micro-batch against the same
    * cached set instead of re-scanning the eval corpus per batch.
    * Output: one column `fp` (md5-64 of each gram).
    */
  def evalGramSet(evalDocs: DataFrame, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val hashUdf = udf { text: String =>
      Hashing.charGramHashes(if (text == null) "" else text, minLen)
    }
    evalDocs.select(explode(hashUdf(col(textCol))).as("fp")).distinct()
  }

  /** [[evalSubstringCut]]'s probe stage against a PRE-BUILT eval gram
    * set (`evalFps` — [[evalGramSet]]'s output, possibly persisted):
    * the stream-static core. See [[evalSubstringCut]] for semantics
    * and the scale argument.
    */
  def evalSubstringCutAgainst(evalFps: DataFrame, train: DataFrame,
                              idCol: String, textCol: String,
                              minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val hashUdf = udf { text: String =>
      Hashing.charGramHashes(if (text == null) "" else text, minLen)
    }
    val hits = train
      .select(col(idCol), posexplode(hashUdf(col(textCol))).as(Seq("p0", "fp")))
      .join(broadcast(evalFps), Seq("fp"), "left_semi")
      .select(col(idCol), (col("p0") + 1L).cast("long").as("s"),
        (col("p0") + 1L + minLen).cast("long").as("e"))
    SuffixArray.mergeSpans(hits, idCol)
  }

  /** Exact Jaccard over two distinct-element string arrays, with the
    * intersection size computed by the codegen'd
    * [[graft.functions.SetOverlap]] (one hash-probe loop, no
    * intermediate array — `size(array_intersect)` allocates the whole
    * intersection just to measure it, per candidate pair).
    */
  private def jaccard(spark: org.apache.spark.sql.SparkSession,
                      a: Column, b: Column): Column = {
    val inter = graft.functions.SetOverlap(spark, a, b).cast("double")
    inter / ((size(a) + size(b)).cast("double") - inter)
  }

  /** Docs annotated with their distinct k-shingle set (single-pass JVM
    * shingling — see Hashing.shingleSet for why not the expression form).
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val shingleUdf = udf { text: String => Hashing.shingleSet(text, k) }
    docs.select(col(idCol).as("doc_id"), shingleUdf(col(textCol)).as("shingles"))
  }

  /** All-pairs exact Jaccard ≥ threshold via cross join (oracle / small data
    * only — O(n²); use [[minhashLsh]] at scale).
    */
  def jaccardBrute(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double): DataFrame = {
    val t = withShingles(docs, idCol, textCol, k)
    val a = t.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(docs.sparkSession, col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** EXACT all-pairs shingle-Jaccard ≥ threshold WITHOUT the cross join:
    * prefix-filtered similarity join (Bayardo/Ma/Srikant, WWW'07
    * "Scaling Up All Pairs Similarity Search"; Xiao et al.'s PPJoin
    * prefix-filtering principle). Identical output to [[jaccardBrute]]
    * — this is a candidate-pruning rewrite, not an approximation — at a
    * cost proportional to genuinely-colliding pairs instead of n².
    *
    * How the pruning stays exact:
    *  - Size filter: J(A,B) ≥ t forces t·|A| ≤ |B| ≤ |A|/t.
    *  - Overlap bound: with the size filter in force,
    *    |A∩B| ≥ t·(|A|+|B|)/(1+t) ≥ t·max(|A|,|B|).
    *  - Prefix-filtering lemma: order every shingle set by ONE global
    *    total order; if |A∩B| ≥ α, the (|A|−α+1)-prefixes of A and B
    *    must share an element. With α = ⌈t·n⌉ per doc, each doc indexes
    *    only its first n − ⌈t·n⌉ + 1 shingles (~(1−t)·n of them), and
    *    any qualifying pair is guaranteed to collide on some indexed
    *    shingle. Candidates are then verified with the exact Jaccard on
    *    the full sets — false candidates are dropped, so the rewrite
    *    can only equal the brute result.
    *
    * The global order is (document frequency ASC, shingle ASC) —
    * rare-first, the standard choice: corpus-boilerplate shingles with
    * huge posting lists sort LAST and almost never land inside a
    * prefix, so the inverted index's per-key fan-out stays small and
    * the candidate join is skew-resistant by construction (residual
    * hot keys are AQE-split like any other join). ⌈t·n⌉ is computed as
    * `ceil(t·n − 1e-9)`: any IEEE upward drift in t·n would SHORTEN the
    * prefix and risk a miss, so the epsilon biases toward a
    * one-longer prefix (conservative, never wrong).
    *
    * Scale shape: shingling is map-only; df is one map-side-combined
    * count; prefix extraction is per-row; the only pair-producing
    * shuffle is the prefix-index self-join keyed by shingle; the
    * verify join touches candidate pairs only.
    */
  def jaccardPrefixJoin(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val t = withShingles(docs, idCol, textCol, k)
    val posts = t.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val dfreq = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    // Rare-first total order: sort each doc's shingles by (df, sh).
    val ordered = posts.join(dfreq, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ord"))
    val pref = ordered.select(
      col("doc_id"),
      size(col("ord")).as("n"),
      expr(s"""transform(
             |  slice(ord, 1, greatest(1,
             |    cast(size(ord) - ceil($threshold * size(ord) - 1e-9) + 1 as int))),
             |  x -> x.sh)""".stripMargin).as("prefix"))
    val px = pref.select(col("doc_id"), col("n"), explode(col("prefix")).as("sh"))
    val eps = 1e-9
    val cand = px.toDF("doc_a", "n_a", "sh")
      .join(px.toDF("doc_b", "n_b", "sh"), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("n_b").cast("double") >= col("n_a") * threshold - eps &&
              col("n_a").cast("double") >= col("n_b") * threshold - eps)
      .select("doc_a", "doc_b").distinct()
    cand
      .join(t.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard", jaccard(docs.sparkSession, col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact shingle-CONTAINMENT join: pairs where
    * `|A∩B| / min(|A|,|B|) ≥ thetaNum/thetaDen` — the asymmetric
    * near-dup measure that catches a document embedded verbatim in a
    * larger one (doc + boilerplate, quote-heavy pages), which Jaccard's
    * symmetric union denominator dilutes below any usable threshold.
    *
    * Exact and never all-pairs: shingles explode into an inverted
    * index, pairs materialize ONLY for docs sharing a shingle (one
    * shingle-keyed self-join), and the intersection size falls out of a
    * (doc_a, doc_b)-keyed count with map-side combine. The threshold
    * test is pure integer arithmetic (`common·den ≥ num·min`), so no
    * float edge can disagree with the oracle; the reported containment
    * ratio is display-only. Known hot spot at scale: a boilerplate
    * shingle with a huge posting list quadratically inflates its
    * bucket — AQE splits the skewed partitions, and the
    * MinHash/winnowing family is the approximate fallback when even
    * that is too much.
    */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0, "theta must be positive")
    val t = withShingles(docs, idCol, textCol, k)
    val sizes = t.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
    val posts = t.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val common = posts.toDF("doc_a", "sh")
      .join(posts.toDF("doc_b", "sh"), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .filter(col("common") * thetaDen >= least(col("n_a"), col("n_b")) * thetaNum)
      .select(col("doc_a"), col("doc_b"), col("common"), col("n_a"), col("n_b"),
        round(col("common").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 4).as("containment"))
  }

  /** MinHash + LSH near-dup pairs, exact-verified.
    *
    * numPerms=128, bands=32 (4 rows/band) ⇒ P(miss | J=0.8) ≈ 5e-8, so the
    * verified output equals the brute-force truth with near certainty while
    * candidate generation is a single shuffle on the bucket key.
    *
    * The signature + band buckets are computed by ONE deterministic JVM
    * function per row (graft.functions.Hashing): an expression-tree form
    * would have its 128-perm signature subtree inlined into every band
    * expression by Catalyst's CollapseProject and recomputed 32× per row
    * (measured 300s vs <1s on 500 docs).
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int, threshold: Double,
                 numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val bucketsUdf = udf { shingles: Seq[String] =>
      val hs = shingles.map(Hashing.stringHash64).toArray
      Hashing.bandBuckets(Hashing.minhashSignature(hs, numPerms), bands)
    }
    bandedVerify(docs, idCol, textCol, k, threshold, bucketsUdf)
  }

  /** [[minhashLsh]] with the signature built by densified
    * one-permutation hashing ([[graft.functions.Hashing.dophSignature]]):
    * one hash pass over the shingles instead of `numPerms` — the
    * map-side cost drops ~128× while band buckets, candidate join, and
    * exact verification keep the identical plan shape. Because the
    * verify stage recomputes TRUE Jaccard on every candidate, DOPH's
    * slightly-higher per-slot variance can only cost recall, never
    * precision — DedupSpec pins output equality with the brute-force
    * truth on the test corpus.
    */
  def minhashLshDoph(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, threshold: Double,
                     numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val bucketsUdf = udf { shingles: Seq[String] =>
      val hs = shingles.map(Hashing.stringHash64).toArray
      Hashing.bandBuckets(Hashing.dophSignature(hs, numPerms), bands)
    }
    bandedVerify(docs, idCol, textCol, k, threshold, bucketsUdf)
  }

  private def bandedVerify(docs: DataFrame, idCol: String, textCol: String,
                           k: Int, threshold: Double,
                           bucketsUdf: org.apache.spark.sql.expressions
                             .UserDefinedFunction): DataFrame = {
    // The shingle set is consumed three times (banding + both sides of the
    // verify join) — materialize it once. MEMORY_AND_DISK: at 100 TB the
    // shingle table exceeds memory and spills instead of recomputing.
    // Tracked: the persist outlives this method (the returned lazy frame
    // reads it), so the consuming harness releases it after its action —
    // see TransientPersists.
    val t = TransientPersists.track(withShingles(docs, idCol, textCol, k))
    val banded = t.select(col("doc_id"), explode(bucketsUdf(col("shingles"))).as("bucket"))
    // Candidate pairs: docs sharing any band bucket. Shuffle key is the
    // bucket, so skew is bounded by bucket collision width, not corpus
    // size. distinct() collapses pairs found in multiple bands.
    val left = banded.select(col("bucket"), col("doc_id").as("doc_a"))
    val right = banded.select(col("bucket"), col("doc_id").as("doc_b"))
    val candidates = left.join(right, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // Exact verification of candidates only.
    val shA = t.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = t.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard", jaccard(docs.sparkSession, col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-duplicate pairs: band the 64-bit signature into
    * `bands` equal chunks, pair docs sharing any chunk, verify with the
    * codegen'd Hamming expression. Pigeonhole guarantee: any pair with
    * Hamming distance < `bands` shares at least one clean chunk, so
    * recall is exact for maxDist ≤ bands-1 (8 bands ⇒ exact ≤ 7); above
    * that it degrades gracefully.
    *
    * Unlike [[minhashLsh]], the verify key is the 8-byte signature
    * itself, so it rides the band join and the Hamming filter runs
    * INSIDE the join, before anything shuffles again. This matters
    * because natural-language simhash bands are heavily clustered (on
    * the sf0.1 corpus ONE 8-bit band value covers ~half the docs —
    * 9.4M candidate pairs); those pairs exist only in the join's
    * codegen'd iterator and die at the filter, instead of being
    * shuffled through a distinct and re-joined (measured 126 MB → <1 MB
    * shuffle, 7.6 s → ~1 s). minhashLsh keeps the candidate→re-join
    * shape because ITS verify needs the full shingle sets, which are
    * too wide to replicate per band.
    */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxDist: Int, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sigUdf = udf { text: String =>
      val toks = text.trim.toLowerCase.split("\\s+")
      Hashing.simhash64(Hashing.md5TokenHashes(toks))
    }
    val sigs = TransientPersists.track(
      docs.select(col(idCol).as("doc_id"), sigUdf(col(textCol)).as("sig")))
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until bands).map { b =>
          // band index in the high bits keeps buckets of different bands apart
          (shiftrightunsigned(col("sig"), b * bits).bitwiseAND(lit(mask)))
            .bitwiseOR(lit(b.toLong << 56))
        }: _*)).as("bucket"))
    val left = banded.select(col("bucket"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val right = banded.select(col("bucket"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    left.join(right, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        graft.functions.HammingDistance(docs.sparkSession, col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .distinct()
  }

  /** Embedding-cosine near-dup pairs via banded hyperplane LSH — the
    * scale path for q30's all-pairs form (same candidate→verify shape as
    * [[minhashLsh]]): band buckets shuffle (bucket, id) pairs only, the
    * exact fused-cosine verify touches candidate pairs, never O(n²) rows.
    *
    * Parameter regimes (math in [[Hashing.hyperplaneBandBuckets]]):
    *  - exactness-tuned, low threshold (default 4 bits × 64 bands for
    *    τ=0.45): per-pair miss < 1e-5, so output matches the brute-force
    *    oracle on any realistic dataset — but near-noise thresholds give
    *    sign-LSH little selectivity, so pruning is modest. That is a
    *    property of the threshold, not the operator: τ=0.45 barely exceeds
    *    the random-pair cosine of i.i.d. vectors.
    *  - pruning-tuned, high threshold (e.g. 16 bits × 32 bands for τ≥0.9,
    *    the realistic near-dup regime): a random pair becomes a candidate
    *    anywhere with P ≈ 5e-4 while true near-dups are kept w.p. ≥ 0.999 —
    *    the O(n²) pair space collapses by ~2000×.
    *
    * Verify placement is regime-dependent (`verifyInJoin`):
    *  - false (default; pruning-tuned regime): candidates are distinct
    *    (id, id) pairs re-joined to the vectors — embeddings cross the
    *    wire once per candidate side, never once per band. Right when
    *    candidates are sparse (high threshold) and vectors are wide.
    *  - true (exactness-tuned regime): embeddings ride the band join and
    *    the fused cosine filter runs INSIDE it — candidate pairs die in
    *    the join's iterator instead of shuffling through a distinct and
    *    two re-joins. Right when the threshold sits near the noise floor
    *    and candidate density approaches all-pairs (q36's case: the
    *    distinct+re-join shape shuffled 37 MB for 14 surviving rows).
    */
  /** Exact embedding near-dup pairs with an ADAPTIVE physical plan: the
    * banding scheme is derived from the threshold's angular separation,
    * and when no scheme can prune, the fused all-pairs kernel is used —
    * which in that regime IS the optimal exact plan.
    *
    * Sign-LSH collision probability at cosine exactly `t` is
    * p = 1 − acos(t)/π; for a random pair (cos ≈ 0) it is 1/2. A banded
    * scheme (b bits × `bands` bands) with per-pair miss probability ≤
    * `missProb` needs bands = ⌈ln(missProb)/ln(1 − p^b)⌉, and its
    * expected candidate volume for uncorrelated pairs is bands/2^b of the
    * all-pairs space. Near the random regime (t ≲ 0.65) no (b, bands)
    * both keeps exactness and prunes: e.g. at t = 0.45, 4×64 banding
    * collides every random pair in ~4 bands — the "LSH" plan then joins
    * MORE rows than the cross join it replaces (measured 4.6 s vs 1.7 s
    * on 2k vectors). [[bandingFor]] encodes that tradeoff; this entry
    * point dispatches on it. Callers with a known-separable threshold can
    * still call [[embedNearDupLsh]] with explicit parameters.
    */
  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    * clustering first and comparing pairs only WITHIN clusters — the
    * embedding-space analog of LSH bucketing, with the clusters doing
    * the pruning. A k-means pass ([[KMeans.fit]], deterministic
    * fixed-point) partitions the corpus into k cells; all-pairs cosine
    * runs per cell, so total pair work is Σ|c_i|² instead of n² —
    * at 100 TB pick k so the expected cell size keeps Σ|c_i|²
    * tractable (k ~ n/√n keeps it ~n^1.5). Keep rule: a vector is
    * dropped iff some LOWER-id vector in the SAME cell has cosine ≥
    * `threshold` to it (keep-first, the q04/q50 convention; the paper
    * keeps the point farthest from the centroid — id order is
    * reproducible under re-clustering, which matters more for
    * training-data provenance).
    *
    * Plan shape: one cluster-keyed shuffle for the self-join (both
    * sides hash-partition on `cluster_id`), the codegen cosine kernel
    * in the join filter, a distinct on dropped ids, and a final id-keyed
    * left join to flag survivors. The known caveat — one giant cluster
    * re-creating the n² blowup — is the k-choice's responsibility;
    * pair work is always bounded by the largest cell.
    *
    * Output: (idCol, cluster_id, kept) — one row per input vector.
    */
  def semanticDedup(vectors: DataFrame, idCol: String, embCol: String,
                    k: Int, iterations: Int, threshold: Double,
                    seeding: KMeans.Seeding = KMeans.Seeding.LowestId): DataFrame = {
    val spark = vectors.sparkSession
    val asg = KMeans.fit(vectors, k, iterations, idCol = idCol,
        vecCol = embCol, seeding = seeding)
      .assignments.select(col(idCol), col("cluster_id"))
    val withC = vectors.select(col(idCol), col(embCol)).join(asg, Seq(idCol))
    val a = withC.select(col("cluster_id"), col(idCol).as("ida"),
      col(embCol).as("ea"))
    val b = withC.select(col("cluster_id"), col(idCol).as("idb"),
      col(embCol).as("eb"))
    val dropped = a.join(b, Seq("cluster_id"))
      .where(col("ida") < col("idb"))
      .where(graft.functions.CosineSimilarity(spark, col("ea"), col("eb"))
        >= threshold)
      .select(col("idb").as(idCol)).distinct()
    withC.select(col(idCol), col("cluster_id"))
      .join(dropped.withColumn("dropFlag", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        col("dropFlag").isNull.as("kept"))
  }

  /** Row-count bound on the exact all-pairs regime (r14 verdict #7):
    * above it the non-separable-threshold path auto-switches from the
    * brute kernel to [[embedNearDupBlocked]]. 2×10⁵ rows ≈ 2×10¹⁰
    * candidate pairs — the top of what the fused codegen kernel clears
    * in a bench-class session; beyond that the quadratic regime is a
    * scale-killer no matter how good the kernel is.
    */
  val BruteMaxRows: Long = 200000L

  def embedNearDup(vectors: DataFrame, idCol: String, embCol: String,
                   threshold: Double, missProb: Double = 1e-5,
                   bruteMaxRows: Long = BruteMaxRows): DataFrame =
    bandingFor(threshold, missProb) match {
      case Some((bits, bands)) =>
        embedNearDupLsh(vectors, idCol, embCol, threshold, bits, bands,
          verifyInJoin = true)
      case None =>
        // Non-separable threshold (sign-LSH can't prune near-random
        // cosines): all-pairs IS the optimal exact plan, but only while
        // the pair space is affordable. Above the row bound, auto-switch
        // to the blocked generator — loudly, because the switch trades
        // exactness (cross-block pairs are not enumerated) for a
        // linear-in-blocks plan a 100 TB run can actually execute.
        val n = vectors.count()
        if (n <= bruteMaxRows) {
          System.err.println(s"[dedup] embedNearDup threshold=$threshold " +
            s"is in the non-separable regime; running EXACT all-pairs " +
            s"(n=$n <= $bruteMaxRows)")
          embedNearDupBrute(vectors, idCol, embCol, threshold)
        } else {
          System.err.println(s"[dedup] embedNearDup threshold=$threshold " +
            s"is in the non-separable regime and n=$n > $bruteMaxRows: " +
            "switching to the BLOCKED pair generator (k-means blocks, " +
            "within-block exact cosine). Cross-block pairs are NOT " +
            "enumerated — recall < 1 by design: measured 0.86 overall " +
            "(1.00 / 0.97 / 0.62 by planted-cosine tier ~0.97/0.86/0.62) " +
            "on the spec's 33-block planted corpus (OperatorsSpec " +
            "\"blocked escape hatch\"); pass a larger bruteMaxRows to " +
            "force the quadratic exact plan")
          embedNearDupBlocked(vectors, idCol, embCol, threshold, n)
        }
    }

  /** The non-separable-regime escape hatch: k-means blocks sized so
    * within-block all-pairs stays tractable (SemDeDup's pruning
    * structure — Abbas et al. 2303.09540 — applied to pair GENERATION),
    * then the exact fused cosine kernel within each block. Same output
    * schema as [[embedNearDupBrute]]; recall is bounded by block purity
    * (similar vectors land in the same k-means cell far more often than
    * chance, which is the only pruning signal available when sign-LSH
    * cannot separate the threshold) — MEASURED 0.86 overall, 1.00 /
    * 0.97 / 0.62 by planted-cosine tier (~0.97 / 0.86 / 0.62), on
    * OperatorsSpec's deterministic 33-block planted corpus ("blocked
    * escape hatch" spec, which pins the ≥0.80 band). Pair work is
    * Σ|c_i|² ≈ n·target — linear in n at fixed target block size.
    */
  def embedNearDupBlocked(vectors: DataFrame, idCol: String, embCol: String,
                          threshold: Double, rowCount: Long,
                          targetBlockRows: Int = 8192): DataFrame = {
    val k = math.max(2L, (rowCount + targetBlockRows - 1) / targetBlockRows).toInt
    val asg = KMeans.fit(vectors, k, iterations = 5, idCol = idCol,
        vecCol = embCol).assignments
      .select(col(idCol), col("cluster_id"))
    val withC = vectors.select(col(idCol), col(embCol)).join(asg, Seq(idCol))
    val a = withC.select(col("cluster_id"), col(idCol).as("vec_a"),
      col(embCol).as("emb_a"))
    val b = withC.select(col("cluster_id"), col(idCol).as("vec_b"),
      col(embCol).as("emb_b"))
    a.join(b, Seq("cluster_id"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", graft.functions.CosineSimilarity(
        vectors.sparkSession, col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** Smallest bits-per-band whose exactness-tuned band count still prunes.
    * Requires expected candidate fraction bands/2^b ≤ 1/4 (≥4× pruning of
    * the uncorrelated-pair space) and bands ≤ 512 (explode-factor bound:
    * banding cost is n·bands rows). Returns None when the threshold sits
    * too close to the random-pair regime for sign-LSH to separate — the
    * caller should run the all-pairs kernel, which no exact method beats
    * there.
    */
  def bandingFor(threshold: Double, missProb: Double = 1e-5): Option[(Int, Int)] = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    val p = 1.0 - math.acos(threshold) / math.Pi
    (4 to 24).view.flatMap { b =>
      val pb = math.pow(p, b)
      val bands = math.ceil(math.log(missProb) / math.log1p(-pb)).toInt
      if (bands <= 512 && bands.toDouble / (1L << b) <= 0.25) Some((b, bands))
      else None
    }.headOption
  }

  /** All-pairs exact cosine near-dup via the fused codegen kernel — the
    * correctness oracle for [[embedNearDupLsh]] and the optimal exact plan
    * in the non-separable threshold regime (see [[embedNearDup]]).
    */
  def embedNearDupBrute(vectors: DataFrame, idCol: String, embCol: String,
                        threshold: Double): DataFrame = {
    val t = vectors.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
    val a = t.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = t.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", graft.functions.CosineSimilarity(
        vectors.sparkSession, col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  def embedNearDupLsh(vectors: DataFrame, idCol: String, embCol: String,
                      threshold: Double, bitsPerBand: Int = 4,
                      bands: Int = 64,
                      verifyInJoin: Boolean = false): DataFrame = {
    val bucketsUdf = udf { v: Seq[Float] =>
      Hashing.hyperplaneBandBuckets(v, bitsPerBand, bands)
    }
    val t = vectors.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
    val cosine = (a: Column, b: Column) =>
      graft.functions.CosineSimilarity(vectors.sparkSession, a, b)
    if (verifyInJoin) {
      val banded = TransientPersists.track(
        t.select(col("vec_id"), col("embedding"),
          explode(bucketsUdf(col("embedding"))).as("bucket")))
      val left = banded.select(col("bucket"), col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"))
      val right = banded.select(col("bucket"), col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"))
      left.join(right, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
        .distinct()
    } else {
      // Both sides of the candidate join consume the banded table —
      // persist it so the signature matrix-product runs once per row
      // (same reasoning as minhashLsh's shingle persist; MEMORY_AND_DISK
      // spills instead of recomputing at corpus scale).
      val banded = TransientPersists.track(
        t.select(col("vec_id"),
          explode(bucketsUdf(col("embedding"))).as("bucket")))
      val left = banded.select(col("bucket"), col("vec_id").as("vec_a"))
      val right = banded.select(col("bucket"), col("vec_id").as("vec_b"))
      val candidates = left.join(right, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val ea = t.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val eb = t.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      candidates.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    }
  }

  /** Connected components over an undirected edge list: every vertex's
    * label converges to the minimum id in its component — the canonical
    * "which document survives a near-dup cluster" assignment
    * (transitive closure of pairwise matches; a pair list alone
    * under-merges A~B, B~C into two clusters).
    *
    * The distributed path is contraction with per-level path
    * compression — see [[ccDistributed]] for the algorithm and its
    * O(log² n)-rounds worst-case bound (near-clique dup graphs finish
    * in 1–2 levels). Lineage is cut with localCheckpoint each level —
    * an iterative plan would otherwise grow unboundedly.
    *
    * Only EDGE-TOUCHED vertices enter the iteration: a vertex with no
    * edges trivially keeps label = id, so the loop's join/agg runs over
    * |endpoints(E)| rows, not |V|, and untouched vertices are restored
    * by one final left join with `coalesce(label, id)`. At corpus scale
    * this is the difference between iterating over billions of docs and
    * iterating over the few-percent that have a near-dup candidate at
    * all — the final join broadcasts the (small) label table.
    *
    * ADAPTIVE dispatch (the broadcast-join principle applied to graph
    * iteration): when the verified-pair list is small — `edges.count()
    * <= localEdgeThreshold`, ≲32 MB collected at the 1M default — the
    * transitive closure is solved with a driver-side union-find and
    * broadcast back, because each distributed round costs a fixed
    * number of Spark jobs (join + checkpoint + convergence probe) that
    * dwarf millisecond-scale work. Above the threshold the contraction
    * path runs. Both paths are exact; OperatorsSpec pins them
    * against each other. The count itself is cheap: the edge list is
    * persisted (it is consumed again by whichever path wins).
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
                          localEdgeThreshold: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (e.count() <= localEdgeThreshold) ccLocal(e, vertices)
      else ccDistributed(e, vertices)
    } finally e.unpersist(blocking = false)
  }

  /** Driver-side union-find for the small-graph regime (path compression
    * + union-by-min, so every root IS its component's minimum id — the
    * same label the distributed path converges to).
    */
  private def ccLocal(e: DataFrame, vertices: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, NumericType, StructField, StructType}
    import scala.collection.mutable
    val idType = vertices.schema("id").dataType
    val lt: (Any, Any) => Boolean = idType match {
      case LongType => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case _: NumericType => (a, b) =>
        new java.math.BigDecimal(a.toString)
          .compareTo(new java.math.BigDecimal(b.toString)) < 0
      case _ => (a, b) => a.toString < b.toString
    }
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x0: Any): Any = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    e.collect().foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    val spark = vertices.sparkSession
    val schema = StructType(Seq(
      StructField("id", idType), StructField("__cc_label", idType)))
    val labelRows = new java.util.ArrayList[Row]()
    parent.keys.foreach(k => labelRows.add(Row(k, find(k))))
    val labels = spark.createDataFrame(labelRows, schema)
    vertices.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("__cc_label"), col("id")).as("label"))
  }

  /** Distributed CC for the large-graph regime: graph CONTRACTION with
    * full path compression per level (the hook-and-compress scheme of
    * Shiloach & Vishkin, in its shuffle-friendly contraction form):
    *
    *  1. HOOK: l(v) = min(v, min neighbor) — every non-local-min vertex
    *     points at a smaller component member (one |E| agg);
    *  2. COMPRESS: iterate l ← l∘l to its fixpoint (each iteration one
    *     |V| self-join + one change probe) — pointer DOUBLING, so a
    *     depth-d label chain flattens in ⌈log2 d⌉ iterations;
    *  3. CONTRACT: rewrite every edge (u,v) as (l(u), l(v)), drop
    *     loops, distinct — each basin of a local minimum collapses to
    *     one super-node; push l on a stack and recurse on the smaller
    *     graph until no edges remain;
    *  4. UNWIND: compose the per-level maps top-down (k ≈ outer-level
    *     count joins, geometrically shrinking tables).
    *
    * Every hook merges each surviving super-node with at least one
    * neighbor, so super-node count at least HALVES per level — ≤ log2 n
    * outer levels for ANY id ordering, with ≤ log2 n compress steps
    * inside each: worst case O(log² n) shuffle rounds, and near-clique
    * dup graphs (the common near-dup workload) finish in 1–2 levels.
    *
    * This replaces the r10–r12 min-label loop whose single-application
    * "shortcut" (label ← label of label, once per round) stalls at
    * local-minimum fixed points: measured on a shuffled diameter-1024
    * chain it needed 349 rounds — reach grew ~3 hops/round, linear in
    * diameter, not logarithmic (exposed the moment OperatorsSpec
    * asserted the ROUND COUNT instead of a wall-clock budget; r12
    * verdict #2). Contraction also preserves the label contract: a
    * component's minimum id is a local min at every level, maps to
    * itself through every hook, and is the unique survivor when its
    * component contracts to one node — so label = component min,
    * exactly what [[ccLocal]] and [[IncrementalCC]] rely on.
    */
  private def ccDistributed(edges: DataFrame, vertices: DataFrame): DataFrame = {
    // Checkpoints.trackedFresh = localCheckpoint + rebuild from the
    // checkpointed RDD: cuts BOTH lineage and INHERITED STATISTICS.
    // LogicalRDD checkpoints carry the origin plan's sizeInBytes
    // forward, and join estimates MULTIPLY — an iterated self-join
    // (compress) therefore SQUARES the estimate each round, doubling
    // its bit-length per join, until Catalyst sits for minutes inside
    // BigInteger.multiply just answering canBroadcastBySize (measured
    // on the deep-chain test: the hang was stats estimation, not work —
    // jstack showed Toom-Cook multiplication under
    // SizeInBytesOnlyStatsPlanVisitor). The rebuilt frame reports
    // defaultSizeInBytes; static join selection turns pessimistic and
    // AQE picks the real strategy from runtime shuffle sizes (the
    // GraphFrames CC workaround). Row conversion cost is per-level and
    // level sizes shrink geometrically, so the roundtrip is noise next
    // to the shuffles. Every superseded checkpoint's blocks are
    // released by tracked id (the leak class that made repeated q153
    // runs climb 8.8 → 20.1 s in one session).
    var allIds = Set.empty[Int]
    def ckptFresh(df: DataFrame): (DataFrame, Set[Int]) = {
      val (fresh, ids) = Checkpoints.trackedFresh(df)
      allIds ++= ids
      (fresh, ids)
    }
    var e = ckptFresh(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")))._1
    var rounds = 0
    // each level's compressed map, WITH the block ids backing it — the
    // unwind must know which ids back the frame it finally returns
    val stack = scala.collection.mutable.ListBuffer.empty[(DataFrame, Set[Int])]
    while (!e.isEmpty) {
      // hook: l(v) = min(v, min over neighbors)
      var (l, lIds) = ckptFresh(e.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("m"))
        .select(col("id"), least(col("id"), col("m")).as("label")))
      rounds += 1
      // compress to fixpoint: l ← l∘l (labels only ever decrease, so
      // the change probe is an inequality on the composed row itself)
      var changed = true
      while (changed) {
        val l2 = l.select(col("id").as("__jid"), col("label").as("__jlabel"))
        val (composed, cIds) = ckptFresh(
          l.join(l2, l("label") === l2("__jid"), "left")
            .select(l("id"), l("label").as("__old"),
              coalesce(col("__jlabel"), l("label")).as("label")))
        rounds += 1
        changed = !composed.filter(col("label") =!= col("__old")).isEmpty
        l = composed.select(col("id"), col("label"))
        lIds = cIds
      }
      stack += ((l, lIds))
      // contract: edges between super-nodes, loops dropped
      e = ckptFresh(e
        .join(l.select(col("id").as("src"), col("label").as("__ls")), Seq("src"))
        .join(l.select(col("id").as("dst"), col("label").as("__ld")), Seq("dst"))
        .select(col("__ls").as("src"), col("__ld").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())._1
      rounds += 1
    }
    lastDistributedRounds.set(rounds)
    // unwind: final(v) = m_k(…m_2(m_1(v))) — compose top-down so every
    // join after the first runs against an already-collapsed map
    val full = stack.reduceRightOption { (m, acc) =>
      val a = acc._1.select(col("id").as("__aid"), col("label").as("__alabel"))
      ckptFresh(m._1.join(a, m._1("label") === a("__aid"), "left")
        .select(m._1("id"),
          coalesce(col("__alabel"), m._1("label")).as("label")))
    }
    // free every checkpoint this call created EXCEPT the blocks backing
    // the returned map (with a single level, that is the level's own
    // compressed map — no compose ran). All checkpoints are eager, so a
    // superseded checkpoint is no longer an input to anything.
    Checkpoints.release(vertices, allIds -- full.map(_._2).getOrElse(Set.empty))
    full match {
      case Some((labels, _)) =>
        vertices.select(col("id"))
          .join(labels.select(col("id"), col("label").as("__cc_label")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("__cc_label"), col("id")).as("label"))
      case None => // no edges at all: every vertex is its own component
        vertices.select(col("id"), col("id").as("label"))
    }
  }

  /** Full near-dup clustering: MinHash-LSH verified pairs → transitive
    * components → (doc_id, cluster_id = surviving min doc_id). Singleton
    * docs keep their own id — `filter(doc_id = cluster_id)` IS the
    * deduplicated corpus.
    */
  def dedupClusters(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, threshold: Double): DataFrame = {
    val pairs = minhashLsh(docs, idCol, textCol, k, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponents(pairs, docs.select(col(idCol).as("id")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Incremental corpus-delta dedup: reduce an INCOMING batch against an
    * existing HISTORY corpus — the daily-crawl shape, where the corpus
    * is petabytes but the delta is not. Returns the incoming docs that
    * survive three tiers: (1) exact — content hash seen in history or
    * in an earlier (lower-id) incoming row; (2) near-dup vs history —
    * Jaccard ≥ threshold against any history doc; (3) near-dup within
    * the batch — [[dedupClusters]] over the survivors, keeping each
    * cluster's minimum id.
    *
    * The scale property that makes this incremental rather than a
    * full-corpus re-dedup: history participates ONLY through (a) its
    * content-hash set, an anti-join key table, and (b) its banded LSH
    * index, which the candidate stage SEMI-JOINS down to the buckets
    * the incoming batch actually hits — history shingle sets are then
    * recomputed just for those candidate doc_ids. In production both
    * are write-once index tables maintained alongside the corpus
    * (exactly the shape [[graft.operators.Bucketing]] persists), so
    * per-delta cost scales with the delta and its collision
    * neighborhood, never with corpus size.
    */
  def dedupAgainst(history: DataFrame, incoming: DataFrame,
                   idCol: String, textCol: String,
                   k: Int, threshold: Double,
                   numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val spark = incoming.sparkSession
    val bucketsUdf = udf { shingles: Seq[String] =>
      Hashing.bandBuckets(
        Hashing.minhashSignature(
          shingles.map(Hashing.stringHash64).toArray, numPerms), bands)
    }
    // tier 1: exact content hash vs history + keep-first within batch
    val histHashes = history.select(md5(col(textCol)).as("content_hash")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy(col(idCol))
    val exactSurvivors = incoming
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(histHashes, Seq("content_hash"), "left_anti")
      .drop("content_hash")
    // tier 2: near-dup vs history — history's banded index pruned to the
    // buckets incoming hits, shingles recomputed for candidates only
    val incShingled = withShingles(exactSurvivors, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val incBanded = incShingled
        .select(col("doc_id"), explode(bucketsUdf(col("shingles"))).as("bucket"))
      val histShingled = withShingles(history, idCol, textCol, k)
      val histBanded = histShingled
        .select(col("doc_id").as("hist_id"),
          explode(bucketsUdf(col("shingles"))).as("bucket"))
        .join(incBanded.select("bucket").distinct(), Seq("bucket"), "left_semi")
      val cand = incBanded.join(histBanded, "bucket")
        .select(col("doc_id"), col("hist_id")).distinct()
      val contaminated = cand
        .join(incShingled, "doc_id")
        .join(histShingled.select(col("doc_id").as("hist_id"),
          col("shingles").as("sh_h")), "hist_id")
        .filter(jaccard(spark, col("shingles"), col("sh_h")) >= threshold)
        .select("doc_id").distinct()
      val vsHistory = exactSurvivors
        .join(contaminated.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
      // tier 3: near-dups inside the batch — keep each cluster's min id
      val keepers = dedupClusters(vsHistory, idCol, textCol, k, threshold)
        .filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id").as(idCol))
      vsHistory.join(keepers, Seq(idCol), "left_semi")
    } finally incShingled.unpersist(blocking = false)
  }

  /** SimHash per doc: 64-bit signature as a bit string. Near-dups have
    * small Hamming distance; bucketing on bit-prefixes gives an LSH analog.
    * JVM function per row for the same recompute reason as [[minhashLsh]].
    * Token hashes are [[Hashing.md5TokenHashes]] (= DuckDB
    * `md5_number_upper`) so the oracle recomputes the bits exactly.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val simhashUdf = udf { text: String =>
      val toks = text.trim.toLowerCase.split("\\s+")
      Hashing.simhashBits(Hashing.md5TokenHashes(toks))
    }
    docs.select(col(idCol).as("doc_id"), simhashUdf(col(textCol)).as("simhash_bits"))
  }
}
