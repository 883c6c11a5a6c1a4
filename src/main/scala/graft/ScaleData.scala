package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived scale-up of the driver's sf0.1 testdata for the bench's
  * scale-rehearsal stage (VERDICT r8 #5): `factor` DISJOINT replicas of
  * each table the rehearsal queries read, built so per-replica workload
  * characteristics match the original — the point is an empirical
  * scaling exponent per heavy operator, which verbatim replication
  * would corrupt:
  *
  *  - key columns shift per replica (disjoint id spaces — exact-distinct
  *    profiling, graph structure, and groups all really scale);
  *  - `documents.text` goes through a per-replica AFFINE letter cipher
  *    (c → a·c + b mod 26 with a coprime to 26, case-preserved): token/
  *    char structure and within-replica repetition are exactly the
  *    original's (the map is a bijection on the alphabet), but
  *    shingles, 40-char grams, and segments are disjoint across
  *    replicas, keeping the corpus duplication RATE at the original's
  *    instead of making every gram a factor-wide hot key. Affine, not
  *    caesar (r12): a caesar shift has only 26 distinct states, so any
  *    factor > 26 (the 100× second-decade tier) would hand replicas
  *    i and i+26 IDENTICAL text — 312 distinct (a, b) pairs cover both
  *    tiers with disjoint gram spaces;
  *  - `customer.c_name` gets a per-replica 6-char suffix built by
  *    repeating a 2-letter replica code 3× — any two replica codes
  *    differ in ≥1 letter, so cross-replica twins of the same base name
  *    sit at edit distance ≥ 3, OUTSIDE both q107's dist-1 and q114's
  *    dist-2 predicates, and the fuzzy-join/lookup outputs scale
  *    linearly like a real bigger dictionary (r12's " z$i$i" suffixes
  *    were pairwise distance 2 — every query name matched all `factor`
  *    replica twins through the shared 2-deletion variant, an
  *    O(factor²·n) cross-replica artifact, not real scaling);
  *  - `embeddings.embedding` is circularly dimension-rotated by the
  *    replica index: cosine is invariant under a permutation applied to
  *    both sides, so WITHIN-replica near-dup/cluster structure is
  *    exactly the original's, while rotated replicas are mutually
  *    uncorrelated — verbatim copies (or tiny perturbations) would make
  *    every vector a factor-wide near-dup clique and blow the candidate
  *    set up O(factor²). (64 dims bound this tweak to factor ≤ 64; the
  *    100× tier carries no embedding queries and skips the table.)
  *
  * Synthetic-performance data only — never a correctness input (the
  * oracle gate runs exclusively on the driver's parquet).
  */
object ScaleData {

  /** The affine cipher's `a` values: the 12 residues coprime to 26.
    * (a, b) with b ∈ 0..25 gives 312 distinct alphabet bijections —
    * replica i uses (coprimes(i / 26 mod 12), i mod 26); i = 0 is the
    * identity, so replica 0 is the original text.
    */
  private val Coprimes26 = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Build `outDir` from `srcDir` at `factor`× if not already present
    * (idempotent via a marker file; safe across rounds). `tables`
    * limits generation to what a tier's query list actually reads —
    * the 100× tier needs documents/lineitem/customer only. The marker
    * records WHICH tables it covers (one line per table), so a later
    * ensure() on the same outDir asking for a table a previous partial
    * generation skipped generates just the missing ones instead of
    * silently no-opping and leaving readers to fail on absent parquet.
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
             factor: Int,
             tables: Set[String] = Set("lineitem", "orders", "customer",
               "documents", "embeddings")): Unit = {
    val marker = new java.io.File(s"$outDir/_SCALED_OK_v4")
    val already: Set[String] =
      if (marker.exists())
        scala.io.Source.fromFile(marker).getLines().map(_.trim)
          .filter(_.nonEmpty).toSet
      else Set.empty
    val missing = tables -- already
    if (missing.isEmpty) return
    require(factor <= 312 || !missing("documents"),
      s"affine text tweak supports <= 312 disjoint replicas, got $factor")
    require(factor <= 64 || !missing("embeddings"),
      s"rotation tweak supports <= 64 disjoint replicas, got $factor")
    val affine = udf { (text: String, i: Int) =>
      if (text == null) null
      else {
        val a = Coprimes26((i / 26) % 12)
        val b = i % 26
        text.map {
          case c if c >= 'a' && c <= 'z' =>
            ('a' + ((c - 'a') * a + b) % 26).toChar
          case c if c >= 'A' && c <= 'Z' =>
            ('A' + ((c - 'A') * a + b) % 26).toChar
          case c => c
        }
      }
    }
    def replicate(name: String)(tweak: (DataFrame, Int) => DataFrame): Unit =
      if (missing(name)) {
        val src = spark.read.parquet(s"$srcDir/$name.parquet")
        (0 until factor).map(i => tweak(src, i)).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 100000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * 100000000L))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 100000000L))
    }
    replicate("customer") { (df, i) =>
      // 2-letter replica code repeated 3×: codes differ in ≥1 letter →
      // suffixes differ in ≥3 positions → cross-replica edit dist ≥ 3
      val code = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      df.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L))
        .withColumn("c_name", concat(col("c_name"), lit(s" $code$code$code")))
    }
    replicate("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 1000000000L))
        .withColumn("text", affine(col("text"), lit(i)))
    }
    val rotate = udf { (v: Seq[Float], k: Int) =>
      if (v == null) null
      else {
        val n = v.length
        val r = k % math.max(1, n)
        (v.drop(r) ++ v.take(r)).toArray
      }
    }
    replicate("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 1000000000L))
        // shift i·7 is distinct mod 64 for i ∈ 0..63 (no replica
        // collides with another's rotation at factor ≤ 64)
        .withColumn("embedding", rotate(col("embedding"), lit(i * 7)))
    }
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath,
      (already ++ missing).toSeq.sorted.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
