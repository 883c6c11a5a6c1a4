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
  *  - `documents.text` is caesar-rotated per replica (letters +i mod 26):
  *    token/char structure and length are preserved, but shingles,
  *    40-char grams, and segments are disjoint across replicas, keeping
  *    the corpus duplication RATE at the original's instead of making
  *    every gram a 10×-duplicated hot key;
  *  - `customer.c_name` gets a 2-char replica suffix, so cross-replica
  *    name pairs sit at edit distance 2 — outside q107's dist-1
  *    predicate — and the fuzzy-join output scales linearly like a real
  *    bigger dictionary (verbatim copies would add O(factor²·n) exact-dup
  *    pairs);
  *  - `embeddings.embedding` is circularly dimension-rotated by the
  *    replica index: cosine is invariant under a permutation applied to
  *    both sides, so WITHIN-replica near-dup/cluster structure is
  *    exactly the original's, while rotated replicas are mutually
  *    uncorrelated — verbatim copies (or tiny perturbations) would make
  *    every vector a factor-wide near-dup clique and blow the candidate
  *    set up O(factor²).
  *
  * Synthetic-performance data only — never a correctness input (the
  * oracle gate runs exclusively on the driver's parquet).
  */
object ScaleData {

  /** Build `outDir` from `srcDir` at `factor`× if not already present
    * (idempotent via a marker file; safe across rounds).
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
             factor: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_SCALED_OK_v2")
    if (marker.exists()) return
    val caesar = udf { (text: String, shift: Int) =>
      if (text == null) null
      else text.map {
        case c if c >= 'a' && c <= 'z' => (('a' + (c - 'a' + shift) % 26)).toChar
        case c if c >= 'A' && c <= 'Z' => (('A' + (c - 'A' + shift) % 26)).toChar
        case c => c
      }
    }
    def replicate(name: String)(tweak: (DataFrame, Int) => DataFrame): Unit = {
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
      df.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L))
        .withColumn("c_name", concat(col("c_name"), lit(s" z$i$i")))
    }
    replicate("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 1000000000L))
        .withColumn("text", caesar(col("text"), lit(i)))
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
        // shift i·7 is distinct mod 64 for i ∈ 0..9 (no replica collides
        // with another's rotation)
        .withColumn("embedding", rotate(col("embedding"), lit(i * 7)))
    }
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
  }
}
