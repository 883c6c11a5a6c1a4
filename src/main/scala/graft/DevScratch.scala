package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  *
  * Current probe (r14, VERDICT #1 — q112's irreproducible exponent):
  * shingle-count distribution of the corpus, and CANDIDATE-PAIR counts
  * of the classic-minhash vs DOPH band bucketing at 1× and 10× — the
  * committed rehearsal shows q112 shuffling 27× the bytes of q25 on
  * the identical bandedVerify plan, so the variance suspect is
  * densification-correlated buckets inflating the candidate set.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Hashing

    def probe(dir: String): Unit = {
      val docs = Tables.documents(spark, dir)
      val sh = graft.operators.Dedup.withShingles(docs, "doc_id", "text", 3)
        .select(col("doc_id"), col("shingles"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dist = sh.select(size(col("shingles")).as("n"))
        .agg(count(lit(1)).as("docs"), min("n"), expr("percentile(n, 0.5)"),
          expr("percentile(n, 0.9)"), max("n"),
          sum(when(col("n") < lit(128), 1).otherwise(0)).as("lt128"),
          sum(when(col("n") < lit(16), 1).otherwise(0)).as("lt16"))
        .collect()(0)
      println(s"[scratch] $dir shingles: $dist")
      def candCount(name: String, bucketsOf: Seq[String] => Array[Long]): Unit = {
        val u = udf { s: Seq[String] =>
          bucketsOf(s)
        }
        val banded = sh.select(col("doc_id"), explode(u(col("shingles"))).as("bucket"))
        val t0 = System.nanoTime()
        val n = banded.toDF("doc_a", "bucket")
          .join(banded.toDF("doc_b", "bucket"), "bucket")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().count()
        println(f"[scratch] $dir $name candidates=$n (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      candCount("classic", s =>
        Hashing.bandBuckets(Hashing.minhashSignature(
          s.map(Hashing.stringHash64).toArray, 128), 32))
      candCount("doph", s =>
        Hashing.bandBuckets(Hashing.dophSignature(
          s.map(Hashing.stringHash64).toArray, 128), 32))
      sh.unpersist(blocking = true)
    }
    probe("/root/testdata/sf0.1")
    probe("scale/sf1")
    spark.stop()
  }
}
