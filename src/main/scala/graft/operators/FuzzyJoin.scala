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
    a.join(b, "v")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
  }
}
