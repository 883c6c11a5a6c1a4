package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Positional postings build, phrase search (overlaps, repeated words,
  * rarest-first chain), and the save/load lifecycle with bucket-level
  * file pruning.
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
    val postings = InvertedIndex.buildPostings(docs)
    val got = InvertedIndex.phraseSearch(postings, Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc0: starts 1 and 3 (overlap); doc1: start 4; doc2: none
    assert(got == Map(0L -> (2L, 1L), 1L -> (1L, 4L)))
  }

  test("a phrase absent from the corpus returns no rows") {
    val postings = InvertedIndex.buildPostings(docsDf(Seq(0L -> "x y z")))
    assert(InvertedIndex.phraseSearch(postings, Seq("y", "x")).count() == 0)
  }

  test("saved index answers identically and prunes to the phrase buckets") {
    val docs = docsDf(Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown cat sat on the quick brown fox",
      2L -> "nothing relevant here at all"))
    val postings = InvertedIndex.buildPostings(docs)
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.savePostings(postings, dir)
    val loaded = InvertedIndex.loadPostings(spark, dir)
    val phrase = Seq("the", "quick", "brown")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val fromBuilt = canon(InvertedIndex.phraseSearch(postings, phrase))
    val fromLoaded = canon(InvertedIndex.phraseSearch(loaded, phrase))
    assert(fromBuilt == fromLoaded)
    assert(fromBuilt.map(t => (t._1, t._2)) == Seq((0L, 1L), (1L, 2L)))
    // directory pruning: the pruned-read shape phraseSearch issues
    // (foldable pmod(xxhash64(lit(w))) against the partition column)
    // must plan a bucket PartitionFilter on the loaded index
    import org.apache.spark.sql.functions._
    val prunedScan = loaded.filter(
      col("bucket") === pmod(xxhash64(lit("quick")), lit(16)) &&
        col("tok") === "quick")
    val plan = prunedScan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).nonEmpty,
      s"no bucket partition filter in:\n$plan")
  }
}
