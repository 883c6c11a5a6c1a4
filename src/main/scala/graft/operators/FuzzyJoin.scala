package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via SymSpell deletion keys — the
  * entity-resolution primitive (near-identical names/titles/URLs) that
  * a naive approach writes as an all-pairs `levenshtein` cross join.
  *
  * SymSpell observation: two strings are within Levenshtein distance 1
  * iff they share a key in {s} ∪ {s with one char deleted} — a
  * substitution at i matches both sides' delete-at-i key, an
  * insert/delete matches the longer side's deletion against the shorter
  * string itself. So: explode each string into its ≤ len+1 deletion
  * keys, equi-join on the key, verify candidates with the codegen'd
  * `levenshtein` builtin. The pair space is bounded by key-bucket
  * sizes, never |rows|² — the same bucket-then-verify shape as the
  * MinHash/SimHash dedup family, applied to edit distance.
  */
object FuzzyJoin {

  /** All unordered pairs at Levenshtein distance ≤ 1 (id_a < id_b),
    * with the distance. Exact: the deletion-key candidate set provably
    * contains every distance-≤1 pair (verified against the brute-force
    * oracle in q107).
    */
  /** All deletion variants of `s` with at most `maxDel` deletions
    * (including `s` itself), distinct. |variants| = O(len^maxDel):
    * 1 + n + n(n−1)/2 at maxDel = 2.
    */
  private[operators] def deletionVariants(s: String, maxDel: Int): Array[String] = {
    var frontier = Set(s)
    val all = scala.collection.mutable.LinkedHashSet(s)
    var d = 0
    while (d < maxDel) {
      frontier = frontier.flatMap { t =>
        (0 until t.length).map(i => t.substring(0, i) + t.substring(i + 1))
      }
      all ++= frontier
      d += 1
    }
    all.toArray
  }

  /** Fuzzy DICTIONARY lookup at Levenshtein distance ≤ `maxDist`
    * (1 or 2) — the SymSpell spell-correction shape: a (relatively
    * small) query set matched against a large dictionary. Both sides
    * explode into their ≤-`maxDist`-deletion variants; the deletion-key
    * theorem guarantees every true match shares at least one key, and
    * candidates are verified with the codegen'd `levenshtein` — so
    * recall is exact and the pair space is bounded by key-bucket
    * products, never |queries|×|dict|.
    *
    * Scale: dictionary variants are the big side — O(|dict| · len²) at
    * maxDist 2 — but they carry only (key, id) pairs through ONE hash
    * join keyed by variant; the quadratic all-pairs verify the naive
    * form pays never materializes. Skewed keys (a short variant shared
    * by many dictionary entries) are AQE-split; the verify stage caps
    * damage since false candidates die on the distance check.
    */
  def lookupDist(queries: DataFrame, qId: String, qStr: String,
                 dict: DataFrame, dId: String, dStr: String,
                 maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    val vUdf = udf { s: String => deletionVariants(s, maxDist) }
    val q = queries
      .select(col(qId).as("q_id"), col(qStr).as("q_s"))
      .withColumn("v", explode(vUdf(col("q_s"))))
    val d = dict
      .select(col(dId).as("d_id"), col(dStr).as("d_s"))
      .withColumn("v", explode(vUdf(col("d_s"))))
    // merge (SMJ), NOT the planner's choice: size estimates predate the
    // explode (a UDF generator inflates rows ~len²/2× invisibly), so the
    // static planner happily BROADCASTS the whole exploded dictionary —
    // measured 3.4 GiB at the 10× rehearsal, an executor/driver OOM at
    // real dictionary scale — and AQE can convert shuffle→broadcast at
    // runtime but never demote a planned broadcast. r12 used a
    // shuffle_hash hint here; the r13 100× rehearsal killed it with
    // "not enough memory to build hash map" — a FORCED hash build
    // cannot spill, so its safety depends on partition sizing holding
    // at every scale, which is exactly the assumption a 100 TB design
    // must not make. Sort-merge spills to disk by construction and
    // keeps AQE skew-splitting for hot short variants; measured at
    // bench scale the difference is noise (the verify join dominates).
    q.join(d.hint("merge"), "v")
      .select("q_id", "d_id", "q_s", "d_s").distinct()
      .withColumn("dist", levenshtein(col("q_s"), col("d_s")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("q_id", "d_id", "dist")
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    * other classic entity-resolution candidate generator: rank rows by
    * a sort key, compare each row only against the `window` rows after
    * it, verify with codegen `levenshtein`. Complements the SymSpell
    * joins: deletion keys catch any edit anywhere but explode with
    * string length; the neighborhood catches typos that PRESERVE the
    * sort-key prefix at O(n·window) candidates regardless of length.
    *
    * Scale shape: the global rank rides [[PrefixSum]]'s two-pass scan
    * (no single-task window), and the neighborhood join is an
    * EQUI-join on `(rank-1) div window` blocks — each left row carries
    * its own block and the next (pairs within `window` of each other
    * live in the same or adjacent blocks), so the pair space is
    * 2·n·window/|block| candidates through one hash join, never n².
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, strCol: String,
                         window: Int, maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = PrefixSum.withRunningTotalOrdered(
      df.select(col(idCol).as("id"), col(strCol).as("s"))
        .withColumn("__key", lower(col("s")))
        .withColumn("__one", lit(1)),
      Seq("__key", "id"), "__one", "rn")
      .select(col("id"), col("s"), col("rn"))
    val a = ranked
      .select(col("id").as("id_a"), col("s").as("s_a"), col("rn").as("rn_a"))
      .withColumn("__b", explode(array(
        expr(s"(rn_a - 1) div $window"),
        expr(s"(rn_a - 1) div $window + 1"))))
    val b = ranked
      .select(col("id").as("id_b"), col("s").as("s_b"), col("rn").as("rn_b"))
      .withColumn("__b", expr(s"(rn_b - 1) div $window"))
    a.join(b, "__b")
      .filter(col("rn_b") > col("rn_a") && col("rn_b") <= col("rn_a") + window)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  def selfJoinDist1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val variants = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("v", explode(expr(
        """CASE WHEN length(s) = 0 THEN array(s)
          | ELSE array_distinct(concat(array(s),
          |   transform(sequence(1, length(s)),
          |     i -> concat(substr(s, 1, i - 1), substr(s, i + 1)))))
          | END""".stripMargin)))
    val a = variants.select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
    val b = variants.select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
    // shuffle_hash for the same reason as lookupDist: the planner's size
    // estimate predates the ~len× Generate, so it would broadcast the
    // whole exploded variant table (scale-unbounded; AQE cannot demote
    // a planned broadcast)
    a.join(b.hint("shuffle_hash"), "v")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
  }
}
