package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Positional postings build, phrase search (overlaps, repeated words,
  * rarest-first chain), the save/load lifecycle with bucket-level file
  * pruning and persisted bucket count, and incremental merge parity.
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  test("postings carry sorted positions and tf") {
    val p = InvertedIndex.buildPostings(docsDf(Seq(
        0L -> "b a b a b",
        1L -> "a c")))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getSeq[Long](2).toList, r.getLong(3)))).toMap
    assert(p(("b", 0L)) == (List(1L, 3L, 5L), 3L))
    assert(p(("a", 0L)) == (List(2L, 4L), 2L))
    assert(p(("a", 1L)) == (List(1L), 1L))
    assert(p(("c", 1L)) == (List(2L), 1L))
  }

  test("phrase search counts overlapping matches and repeated words") {
    val docs = docsDf(Seq(
      0L -> "a b a b a",
      1L -> "a b c a b a",
      2L -> "b a b"))
    val idx = InvertedIndex.buildIndex(docs)
    val got = InvertedIndex.phraseSearch(idx, Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc0: starts 1 and 3 (overlap); doc1: start 4; doc2: none
    assert(got == Map(0L -> (2L, 1L), 1L -> (1L, 4L)))
  }

  test("a phrase absent from the corpus returns no rows") {
    val idx = InvertedIndex.buildIndex(docsDf(Seq(0L -> "x y z")))
    assert(InvertedIndex.phraseSearch(idx, Seq("y", "x")).count() == 0)
  }

  test("saved index answers identically, prunes to the phrase buckets, and carries its bucket count") {
    val docs = docsDf(Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown cat sat on the quick brown fox",
      2L -> "nothing relevant here at all"))
    // a NON-default bucket count: the searcher must recover it from the
    // sidecar — a default-16 guess against a 7-bucket index would
    // compute wrong foldable bucket predicates and silently match nothing
    val idx = InvertedIndex.buildIndex(docs, numBuckets = 7)
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.saveIndex(idx, dir)
    val loaded = InvertedIndex.loadIndex(spark, dir)
    assert(loaded.numBuckets == 7)
    val phrase = Seq("the", "quick", "brown")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val fromBuilt = canon(InvertedIndex.phraseSearch(idx, phrase))
    val fromLoaded = canon(InvertedIndex.phraseSearch(loaded, phrase))
    assert(fromBuilt == fromLoaded)
    assert(fromBuilt.map(t => (t._1, t._2)) == Seq((0L, 1L), (1L, 2L)))
    // directory pruning: the pruned-read shape phraseSearch issues
    // (foldable pmod(xxhash64(lit(w))) against the partition column)
    // must plan a bucket PartitionFilter on the loaded index
    import org.apache.spark.sql.functions._
    val prunedScan = loaded.postings.filter(
      col("bucket") === pmod(xxhash64(lit("quick")), lit(7)) &&
        col("tok") === "quick")
    val plan = prunedScan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).nonEmpty,
      s"no bucket partition filter in:\n$plan")
  }

  test("loadIndex refuses a directory without the meta sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("notidx").toString
    docsDf(Seq(0L -> "a")).write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.loadIndex(spark, dir)
    }
    assert(e.getMessage.contains("_graft_meta.json"))
  }

  test("merge(build(old), build(delta)) equals build(old-minus-delta ∪ delta)") {
    val oldDocs = Seq(
      0L -> "the quick brown fox",
      1L -> "stale text to be replaced",
      2L -> "another old document kept as is")
    val deltaDocs = Seq(
      1L -> "fresh recrawled text replacing the stale one",
      3L -> "a brand new document from the daily batch")
    val merged = InvertedIndex.merge(
      InvertedIndex.buildIndex(docsDf(oldDocs), numBuckets = 8),
      InvertedIndex.buildIndex(docsDf(deltaDocs), numBuckets = 8))
    assert(merged.numBuckets == 8)
    val full = InvertedIndex.buildIndex(
      docsDf(oldDocs.filterNot { case (id, _) => deltaDocs.exists(_._1 == id) }
        ++ deltaDocs), numBuckets = 8)
    def canon(idx: InvertedIndex.PostingsIndex) = idx.postings
      .select("tok", "doc_id", "positions", "tf", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(canon(merged) == canon(full))
  }

  test("merge rejects mismatched bucket counts") {
    val d = docsDf(Seq(0L -> "a b"))
    intercept[IllegalArgumentException] {
      InvertedIndex.merge(InvertedIndex.buildIndex(d, numBuckets = 8),
        InvertedIndex.buildIndex(d, numBuckets = 16))
    }
  }
}
