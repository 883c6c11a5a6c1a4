package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-rehearsal data derivation must actually scale the
  * workload, not just the row count: disjoint key spaces, per-replica
  * text that does NOT re-share grams with the original, and embedding
  * rotations that keep within-replica geometry while decorrelating
  * replicas.
  */
class ScaleDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("scaled").toFile.getAbsolutePath
    ScaleData.ensure(spark, src, dir, factor = 2)
    dir
  }

  test("row counts scale by the factor; key spaces are disjoint") {
    import org.apache.spark.sql.functions._
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings")) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$out/$t.parquet").count()
      assert(n1 == 2 * n0, s"$t: $n1 != 2*$n0")
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    // second replica's ids sit in the shifted space
    assert(docs.filter(col("doc_id") >= 1000000000L).count() == docs.count() / 2)
  }

  test("caesar rotation keeps doc length but shares no 40-gram with the original") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val orig = docs.filter(col("doc_id") < 1000000000L)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val rot = docs.filter(col("doc_id") >= 1000000000L)
      .select((col("doc_id") - 1000000000L).as("doc_id"),
        col("text").as("text_r"), length(col("text")).as("len_r"))
    val joined = orig.join(rot, "doc_id")
    assert(joined.filter(col("len") =!= col("len_r")).count() == 0)
    // gram disjointness: no 40-char window of a rotated doc appears in
    // its original (letters moved; digits/punct alone can't span 40
    // chars in this corpus)
    val shared = joined.filter(length(col("text")) >= 40)
      .filter(expr("locate(substring(text_r, 1, 40), text)") > 0)
    assert(shared.count() == 0)
  }

  test("embedding rotation preserves within-replica cosine structure exactly") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val o = emb.filter(col("vec_id") < 1000000000L)
      .select(col("vec_id"), col("embedding").as("e0"))
    val r = emb.filter(col("vec_id") >= 1000000000L)
      .select((col("vec_id") - 1000000000L).as("vec_id"), col("embedding").as("e1"))
    // rotation is a permutation: the multiset of components is unchanged
    val rows = o.join(r, "vec_id").limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val a = row.getSeq[Float](1)
      val b = row.getSeq[Float](2)
      assert(a.sorted == b.sorted, s"vec ${row.getLong(0)} is not a permutation")
      assert(a != b, s"vec ${row.getLong(0)} was not rotated")
    }
  }

  test("ensure is idempotent (marker short-circuits a rebuild)") {
    val t0 = System.nanoTime()
    ScaleData.ensure(spark, src, out, factor = 2)
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "second ensure must be a no-op")
  }

  test("a partial generation's marker records its tables; a later ensure fills the gap") {
    val dir = java.nio.file.Files.createTempDirectory("scaled_part")
      .toFile.getAbsolutePath
    ScaleData.ensure(spark, src, dir, factor = 2, tables = Set("lineitem"))
    assert(new java.io.File(s"$dir/lineitem.parquet").exists())
    assert(!new java.io.File(s"$dir/orders.parquet").exists())
    // the 100x-tier bug shape: same outDir, wider table set — the
    // marker must NOT mark orders complete, and the second call must
    // generate it (and only it: lineitem's mtime stays put)
    val liBefore = new java.io.File(s"$dir/lineitem.parquet").lastModified()
    ScaleData.ensure(spark, src, dir, factor = 2,
      tables = Set("lineitem", "orders"))
    assert(new java.io.File(s"$dir/orders.parquet").exists(),
      "missing table must be generated on the wider request")
    assert(new java.io.File(s"$dir/lineitem.parquet").lastModified() == liBefore,
      "already-covered table must not be rebuilt")
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(n == 2 * spark.read.parquet(s"$src/orders.parquet").count())
  }
}
