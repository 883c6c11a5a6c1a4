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
  * document's features (doc-length-bounded); candidate generation
  * joins only the PREFIX of each vector (rarest-first global order,
  * suffix upper bound < θ) against the inverted feature list, so
  * candidates are bounded by rare-token collisions, with AQE skew
  * handling on the join; verification attaches each side's feature
  * map once (doc-keyed joins) and evaluates the exact dot in-row.
  * The prefix bound uses θ − 1e-9: float drift can only widen the
  * candidate superset, never lose a true pair — correctness rests on
  * the exact verify.
  */
object Apss {

  /** All pairs (doc_a < doc_b) with tf-idf trigram cosine ≥ theta:
    * (doc_a, doc_b, cos rounded to 4). */
  def tfidfCosineSelfJoin(docs: DataFrame, theta: Double,
                          docIdCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
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
      .select(col(docIdCol), explode(expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
          |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
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
    val mx = u.groupBy("g").agg(max(col("u")).as("maxw"))
    // prefix bound: suffix sum of u·maxw in rarest-first global order
    // (ascending df, then token) — a feature is indexed iff the tail
    // INCLUDING it could still reach θ
    val wTail = Window.partitionBy(col(docIdCol)).orderBy(col("df"), col("g"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val index = u.join(mx, Seq("g"))
      .withColumn("bound", sum(col("u") * col("maxw")).over(wTail))
      .filter(col("bound") >= theta - 1e-9)
      .select(col("g"), col(docIdCol))
    val feats = u.select(col(docIdCol).as("fd"), col("g"))
    val cand = index.join(feats, Seq("g"))
      .filter(col(docIdCol) =!= col("fd"))
      .select(least(col(docIdCol), col("fd")).as("doc_a"),
        greatest(col(docIdCol), col("fd")).as("doc_b"))
      .distinct()
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
