package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the near-dup family's production
  * lifecycle (build → save → load → probe), mirroring the IVF
  * (`Similarity.saveIvfIndex`) and postings (`InvertedIndex`)
  * lifecycles: at 100 TB the reference corpus's banded signatures are
  * a write-once index table maintained alongside the corpus, and each
  * day's crawl PROBES it — never re-hashes the corpus.
  *
  * Layout: `(dir, bucket, doc_id)` parquet partitioned by
  * `dir = pmod(bucket, numDirs)`, so a probe whose incoming batch hits
  * a subset of dirs prunes whole directories at the file-listing
  * level; within a dir, parquet min/max stats on `bucket` prune row
  * groups. The `_graft_meta.json` sidecar persists (k, numPerms,
  * bands, numDirs) — the `InvertedIndex` rule: hash-domain parameters
  * travel WITH the data, because a mismatched guess (different shingle
  * k or band count) would silently match nothing.
  *
  * Probe semantics = [[Dedup.dedupAgainst]]'s tier 2 against the
  * persisted form: candidates from bucket equality, then EXACT Jaccard
  * verification (shingles recomputed only for candidate reference
  * docs — the index never stores shingle sets, which would be a
  * k-gram-amplified copy of the corpus). Verified output ⇒ banding
  * parameters only affect recall odds (P(miss | J ≥ 0.7) ≈ 5e-8 at
  * 128/32), never precision — so the brute cross-half SQL oracle is
  * exact for the same reason q25's is.
  */
object LshIndex {

  final case class Handle(buckets: DataFrame, k: Int, numPerms: Int,
                          bands: Int, numDirs: Int)

  private val MetaFile = "_graft_meta.json"

  private def bucketsUdf(k: Int, numPerms: Int, bands: Int) = udf { text: String =>
    Hashing.bandBuckets(
      Hashing.minhashSignature(
        Hashing.shingleSet(text, k).map(Hashing.stringHash64), numPerms), bands)
  }

  /** Band-bucket rows for a corpus: (dir, bucket, doc_id). */
  def build(docs: DataFrame, idCol: String, textCol: String, k: Int,
            numPerms: Int = 128, bands: Int = 32, numDirs: Int = 16): Handle = {
    val b = docs
      .select(col(idCol).as("doc_id"),
        explode(bucketsUdf(k, numPerms, bands)(col(textCol))).as("bucket"))
      .select(pmod(col("bucket"), lit(numDirs.toLong)).as("dir"),
        col("bucket"), col("doc_id"))
    Handle(b, k, numPerms, bands, numDirs)
  }

  /** Resolve the filesystem OWNING `path` (local, hdfs://, s3a://, …) —
    * the sidecar must land next to the parquet on the SAME filesystem,
    * or a remote index writes its data remotely but its parameters
    * locally and the "parameters travel WITH the data" contract breaks
    * (r12 ADVICE).
    */
  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def save(h: Handle, path: String): Unit = {
    h.buckets.write.mode("overwrite").partitionBy("dir").parquet(path)
    val meta = s"""{"k":${h.k},"numPerms":${h.numPerms},"bands":${h.bands},"numDirs":${h.numDirs}}"""
    val (fs, root) = fsFor(h.buckets.sparkSession, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, MetaFile), true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a saved index; every hash-domain parameter comes from the
    * sidecar, never the caller.
    */
  def load(spark: SparkSession, path: String): Handle = {
    val (fs, root) = fsFor(spark, path)
    val metaPath = new org.apache.hadoop.fs.Path(root, MetaFile)
    require(fs.exists(metaPath),
      s"not a graft LSH index (missing $MetaFile): $path")
    val in = fs.open(metaPath)
    val meta =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    def intOf(key: String): Int =
      ("\"" + key + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(meta)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"malformed $MetaFile at $path (missing $key): $meta"))
    Handle(spark.read.parquet(path), intOf("k"), intOf("numPerms"),
      intOf("bands"), intOf("numDirs"))
  }

  /** Probe `incoming` against a (loaded) index: verified near-dup pairs
    * `(doc_id, ref_id, jaccard)` with exact Jaccard ≥ `threshold`.
    *
    * `refDocs` supplies candidate verification text — the corpus the
    * index was built over (kept alongside the index in production).
    * Plan shape: the incoming batch's dir set is collected driver-side
    * (≤ numDirs values — bounded by construction, not data) into a
    * STATIC partition filter, so the index scan lists only the hit
    * directories; a bucket semi-join then prunes row groups; the
    * candidate set is (incoming × hit-bucket) sized; verification
    * recomputes shingles for exactly the candidate ref docs via
    * semi-join. Per-delta cost scales with the delta and its collision
    * neighborhood, never with corpus size.
    */
  def probe(index: Handle, refDocs: DataFrame, incoming: DataFrame,
            idCol: String, textCol: String, threshold: Double): DataFrame = {
    val spark = incoming.sparkSession
    val incB = incoming
      .select(col(idCol).as("doc_id"),
        explode(bucketsUdf(index.k, index.numPerms, index.bands)(col(textCol)))
          .as("bucket"))
      .withColumn("dir", pmod(col("bucket"), lit(index.numDirs.toLong)))
      .localCheckpoint()
    val hitDirs = incB.select("dir").distinct().collect().map(_.getLong(0))
    val refB = index.buckets
      .filter(col("dir").isin(hitDirs.toSeq: _*))
      .join(incB.select("bucket").distinct(), Seq("bucket"), "left_semi")
      .select(col("bucket"), col("doc_id").as("ref_id"))
    val cand = incB.select("doc_id", "bucket")
      .join(refB, Seq("bucket"))
      .select("doc_id", "ref_id").distinct()
    val incSh = Dedup.withShingles(incoming, idCol, textCol, index.k)
      .withColumnRenamed("shingles", "sh_i")
    val refSh = Dedup.withShingles(
        refDocs.join(cand.select(col("ref_id").as(idCol)).distinct(),
          Seq(idCol), "left_semi"),
        idCol, textCol, index.k)
      .select(col("doc_id").as("ref_id"), col("shingles").as("sh_r"))
    // exact Jaccard via the codegen SetOverlap intersection count (the
    // Dedup.jaccard form: no intermediate intersection array)
    val inter = graft.functions.SetOverlap(spark, col("sh_i"), col("sh_r"))
      .cast("double")
    val jac = inter / ((size(col("sh_i")) + size(col("sh_r"))).cast("double") - inter)
    cand
      .join(incSh, "doc_id")
      .join(refSh, "ref_id")
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("ref_id"), col("jaccard"))
  }
}
