package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted all-pairs similarity self-join (APSS) — tf-idf cosine over
  * word-trigram features with Bayardo/Chaudhuri prefix filtering
  * (WWW'07 "Scaling Up All Pairs Similarity Search"): the weighted
  * complement of q24's set-Jaccard prefix join. Finds every document
  * pair with cosine ≥ θ without ever forming the n² pair space.
  *
  * Engine-parity rules (the oracle replays every number bit-for-bit):
  *  - idf is the RATIONAL N/df — one IEEE division, no transcendental
  *    (q117's rule: `ln` rounds differently across libms);
  *  - norms and dot products are LEFT FOLDS IN TOKEN-SORTED ORDER
  *    (q27's fold-parity pattern); missing tokens contribute +0.0,
  *    which is IEEE-exact;
  *  - sqrt and division are correctly rounded, so every weight is
  *    bit-identical across engines and the θ cut selects the same rows.
  *
  * Scale shape: features and weights are two map-side-combined
  * aggregations (token-keyed — hot grams are agg keys, never window
  * partitions); the per-doc prefix bound is a window over ONE
  * document's features (doc-length-bounded); candidate generation is
  * the PREFIX–PREFIX self-join (rarest-first global order, suffix
  * upper bound < θ): if cos(x,y) ≥ θ then the FIRST shared gram g₁ in
  * the global order is in BOTH prefixes — were g₁ outside x's prefix,
  * every shared gram would sit in x's suffix and
  * cos ≤ Σ_suffix uₓ·maxw < θ (and symmetrically for y) — so joining
  * prefix against prefix loses nothing, while joining prefix against
  * the full feature list (Bayardo's one-sided form, the r10 shape)
  * admitted every rare-gram collision. Candidates then pass pair-level
  * bounds BEFORE the verify join (see prefixCandidates): the matched
  * mass Σ_M uₓu_y plus the tightest of three sound remainder bounds —
  * the L2AP last-matched-gram tail product, the κ-tail cap, and the
  * complement Cauchy–Schwarz — decides whether a pair can reach θ at
  * all. Measured at sf0.1 (5000 docs, 140 true pairs ≥ 0.6): 362K
  * candidates (2600:1) with the r10 one-sided prefix join → 4.1K
  * (29:1) with this bound stack, 19 s → ~3.5 s wall-clock. Every
  * bound uses θ − 1e-9: float drift can only widen the candidate
  * superset, never lose a true pair — correctness rests on the exact
  * verify.
  */
object Apss {

  /** All pairs (doc_a < doc_b) with tf-idf trigram cosine ≥ theta:
    * (doc_a, doc_b, cos rounded to 4). */
  def tfidfCosineSelfJoin(docs: DataFrame, theta: Double,
                          docIdCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val (u, cand) = prefixCandidates(docs, theta, docIdCol, textCol)
    verify(u, cand, theta, docIdCol)
  }

  /** Candidate stage, exposed for cardinality probes (the
    * candidates-per-match ratio is the operator's scale health metric):
    * returns (normalized unit-weight features `u`, surviving candidate
    * pairs). Exact-preserving — every pair with cos ≥ θ survives.
    */
  private[graft] def prefixCandidates(docs: DataFrame, theta: Double,
                                      docIdCol: String,
                                      textCol: String): (DataFrame, DataFrame) = {
    val n = docs.count().toDouble
    // split ONCE into a column before the lambda — element_at over a
    // re-split inside the transform would re-tokenize the whole doc
    // per element (O(len²) per doc, measured ~15× slower)
    // docs with < 3 words form no trigram; without the guard,
    // sequence(1, size-2) is DESCENDING (e.g. sequence(1,0) = [1,0])
    // and element_at(ws, 0) throws — the oracle's range() is simply
    // empty there, so pre-filtering is the exact-parity shape
    val tf = docs
      .select(col(docIdCol), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      // explode the POSITION, form the gram in the projection after it:
      // concat_ws/element_at run in whole-stage codegen, where the
      // former transform-lambda was interpreted per element (measured
      // 0.52 → 0.28 s for the gram stage at sf0.1, tools.AbProbe "tri")
      .select(col(docIdCol), col("ws"),
        explode(sequence(lit(1), size(col("ws")) - 2)).as("i"))
      .select(col(docIdCol), concat_ws(" ",
        element_at(col("ws"), col("i")),
        element_at(col("ws"), col("i") + 1),
        element_at(col("ws"), col("i") + 2)).as("g"))
      .groupBy(col(docIdCol), col("g"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("g").agg(count(lit(1)).cast("double").as("df"))
    val wt = tf.join(dfreq, Seq("g"))
      .withColumn("w", col("tf") * (lit(n) / col("df")))
    val nrm = wt.groupBy(col(docIdCol))
      .agg(sqrt(expr(
        "aggregate(sort_array(collect_list(struct(g, w))), CAST(0 AS DOUBLE), (acc, x) -> acc + x.w * x.w)"))
        .as("nrm"))
    // h = xxhash64 of the gram: the verify arrays carry (h, u) instead
    // of ~20-char gram strings — half the shuffle bytes and long
    // compares in the fold. The hash never needs oracle replay because
    // the final summation is ordered by the PRODUCT VALUES (below),
    // not by h; a cross-gram collision inside one pair (≈ pairs·m²·2⁻⁶⁴)
    // would surface as an oracle mismatch.
    val u = wt.join(nrm, Seq(docIdCol))
      .select(col(docIdCol), col("g"), col("df"), xxhash64(col("g")).as("h"),
        (col("w") / col("nrm")).as("u"))
      .localCheckpoint()
    // partner cap: the largest weight any OTHER doc can bring to gram g.
    // For the gram's argmax doc that is the second-largest weight; for a
    // df=1 gram it is 0 — a gram nobody else has can never contribute to
    // any pair's dot, so it must not inflate the prefix bound (with
    // global maxw, the mass of unique trigrams — most of a real corpus —
    // kept every prefix near-total: measured 243K candidates vs ~3K
    // with the cap at sf0.1). Two map-side-combined aggs + join-back,
    // never a per-gram collect (a hot gram's df is unbounded at 100 TB).
    val m1t = u.groupBy("g").agg(max(col("u")).as("m1"))
    val capTbl = u.join(m1t, Seq("g"))
      .groupBy("g")
      .agg(first(col("m1")).as("m1"),
        sum(when(col("u") === col("m1"), 1L).otherwise(0L)).as("nmax"),
        max(when(col("u") < col("m1"), col("u"))).as("m2below"),
        count(lit(1)).as("dfc"))
      .select(col("g"), col("m1"),
        when(col("nmax") >= 2, col("m1"))
          .otherwise(coalesce(col("m2below"), lit(0.0))).as("m2"),
        col("dfc"))
    // prefix bound, L2AP-style (Anastasiu & Karypis, SIGMOD'14): a
    // feature is indexed iff the tail INCLUDING it could still reach θ
    // under the TIGHTER of two sound bounds on the tail's pair-dot
    // contribution:
    //  - Σ_tail u·pcap (Bayardo weight bound; pcap per-row — the argmax
    //    doc of g bounds its partners by m2, everyone else by m1, still
    //    ≥ u_y for every y ≠ x);
    //  - ‖u_tail‖₂ (Cauchy–Schwarz against the partner's whole unit
    //    vector) — the bound that bites on dense-overlap corpora where
    //    weights are uniform and maxw stays high.
    // Both shrink monotonically along the order, so the prefix is still
    // a prefix and the first-shared-gram argument is unchanged.
    // κ-extension (the "single-collision" killer): indexing ONLY the
    // θ-prefix leaves each doc's last ~(1−θ²) of mass unindexed, so a
    // pair sharing one rare gram has a remainder bound ≈ snₓ·sn_y ≈ 1 —
    // unprunable, and such collisions dominate candidates on a
    // dense-overlap corpus. Extending the index to where the tail's L2
    // norm drops below κ (< θ/2) caps every unmatched shared gram's
    // side at κ, so the remainder is ≤ κ·(√(1−Σ_M uₓ²) + √(1−Σ_M u_y²))
    // < θ for weak-match pairs. Both cut rules decrease monotonically
    // along the order, so the indexed set stays a prefix and the
    // first-shared-gram completeness argument is untouched (the
    // κ-prefix contains the θ-prefix).
    val kappa = 0.45 * theta
    val wTail = Window.partitionBy(col(docIdCol)).orderBy(col("df"), col("g"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val index = u.join(capTbl, Seq("g"))
      .withColumn("pcap",
        when(col("u") < col("m1"), col("m1")).otherwise(col("m2")))
      .withColumn("bsum", sum(col("u") * col("pcap")).over(wTail))
      .withColumn("sn2", sum(col("u") * col("u")).over(wTail))
      .withColumn("snr", sqrt(col("sn2")))
      .withColumn("bound", least(col("bsum"), col("snr")))
      .filter(col("bound") >= theta - 1e-9 || col("snr") >= kappa - 1e-9)
      // df=1 grams may shape the bound above but can never match another
      // doc — keep them out of the join input entirely
      .filter(col("dfc") >= 2)
      // sna: L2 norm of the tail strictly AFTER g — the pair-level
      // remainder bound below reads it at the last matched gram
      .withColumn("sna",
        sqrt(greatest(lit(0.0), col("sn2") - col("u") * col("u"))))
      .select(col("g"), col(docIdCol), col("u"), col("sna"))
    // prefix–prefix candidate join (symmetric, so doc_a < doc_b covers
    // every pair once), then the pair-level bound: every shared gram
    // OUTSIDE the matched set M lies after the LAST matched gram in the
    // global order (were it earlier, it would be inside both prefixes
    // and hence in M), so the unmatched remainder is Cauchy–Schwarz-
    // bounded by snaₓ·sna_y AT that gram — and since sna decreases along
    // the order, that is exactly min over M of snaₓ·sna_y. The groupBy
    // both DEDUPS multi-gram candidates and accumulates the bound terms
    // in the same shuffle — no extra pass over candidates. The
    // complement-mass bound √((1−Σ_M uₓ²)(1−Σ_M u_y²)) is sound too;
    // take the tighter of the two.
    val ia = index.select(col("g"), col(docIdCol).as("doc_a"),
      col("u").as("ua"), col("sna").as("sa"))
    val ib = index.select(col("g"), col(docIdCol).as("doc_b"),
      col("u").as("ub"), col("sna").as("sb"))
    val cand = ia.join(ib, Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("ua") * col("ub")).as("dotM"),
        min(col("sa") * col("sb")).as("rem"),
        sum(col("ua") * col("ua")).as("mxm"),
        sum(col("ub") * col("ub")).as("mym"))
      .filter(col("dotM") + least(
        col("rem"),
        lit(kappa) * (sqrt(greatest(lit(0.0), lit(1.0) - col("mxm"))) +
          sqrt(greatest(lit(0.0), lit(1.0) - col("mym")))),
        sqrt(greatest(lit(0.0),
          (lit(1.0) - col("mxm")) * (lit(1.0) - col("mym"))))) >= theta - 1e-9)
      .select("doc_a", "doc_b")
    (u, cand)
  }

  /** Exact verification of candidate pairs against the unit-weight
    * features `u`; only survivors of the candidate bounds pay this
    * array-attach cost.
    */
  private def verify(u: DataFrame, cand: DataFrame, theta: Double,
                     docIdCol: String): DataFrame = {
    // exact verify: merge the two token-sorted feature arrays and fold
    // once — adjacent equal tokens (each token is unique per doc, so at
    // most one per side) contribute their product, in ascending-token
    // order, matching the oracle's ORDER BY g fold bit-for-bit. A
    // map-lookup fold (element_at on MapType is a linear scan) costs
    // O(m²) string compares per pair — measured 25 s vs ~2 s here.
    val farr = u.groupBy(col(docIdCol))
      .agg(expr("sort_array(collect_list(struct(h, u)))").as("farr"))
    // merged fold collects the shared-token PRODUCTS, then sums them in
    // ascending product order — an order both engines can replay
    // (`ORDER BY prod`; equal products commute exactly, all products
    // are positive, and the sentinel's 0.0 contributions are IEEE
    // no-ops)
    val verified = cand
      .join(farr.select(col(docIdCol).as("doc_a"), col("farr").as("fa")), Seq("doc_a"))
      .join(farr.select(col(docIdCol).as("doc_b"), col("farr").as("fb")), Seq("doc_b"))
      .withColumn("cos", expr(
        """aggregate(
          |  sort_array(
          |    aggregate(sort_array(concat(fa, fb)),
          |      struct(CAST(0 AS BIGINT) AS ph, CAST(0 AS DOUBLE) AS pu,
          |             CAST(array() AS ARRAY<DOUBLE>) AS ps),
          |      (s, x) -> struct(x.h AS ph, x.u AS pu,
          |        IF(x.h = s.ph, array_append(s.ps, s.pu * x.u), s.ps) AS ps),
          |      s -> s.ps)),
          |  CAST(0 AS DOUBLE), (acc, p) -> acc + p)""".stripMargin))
      .filter(col("cos") >= theta)
    verified.select(col("doc_a"), col("doc_b"), round(col("cos"), 4).as("cos"))
  }
}
