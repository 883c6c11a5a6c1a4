package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted MinHash-LSH index lifecycle: save/load parameter
  * round-trip, probe ≡ brute cross-set truth, missing-sidecar error,
  * and the partition-pruned probe scan.
  */
class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("save/load round-trips the hash parameters via the sidecar") {
    val docs = Tables.documents(spark, dir).limit(50)
    val tmp = Files.createTempDirectory("lshidx").toFile.getAbsolutePath
    val built = LshIndex.build(docs, "doc_id", "text", 3,
      numPerms = 64, bands = 16, numDirs = 8)
    LshIndex.save(built, s"$tmp/idx")
    val loaded = LshIndex.load(spark, s"$tmp/idx")
    assert(loaded.k == 3 && loaded.numPerms == 64 &&
      loaded.bands == 16 && loaded.numDirs == 8)
    // same bucket rows (the layout adds the dir partition column)
    val a = built.buckets.select("bucket", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = loaded.buckets.select("bucket", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("loading a non-index path fails loudly") {
    val tmp = Files.createTempDirectory("lshempty").toFile.getAbsolutePath
    val e = intercept[IllegalArgumentException] {
      LshIndex.load(spark, tmp)
    }
    assert(e.getMessage.contains("_graft_meta.json"))
  }

  test("probe against the loaded index equals the brute cross-set truth") {
    val docs = Tables.documents(spark, dir)
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
    val tmp = Files.createTempDirectory("lshprobe").toFile.getAbsolutePath
    LshIndex.save(LshIndex.build(ref, "doc_id", "text", 3), s"$tmp/idx")
    val got = LshIndex.probe(LshIndex.load(spark, s"$tmp/idx"), ref, inc,
        "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // brute truth: every cross-half pair with exact Jaccard >= 0.7
    val sh = Dedup.withShingles(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      (i, si) <- sh.toSeq if i % 2 == 1
      (r, sr) <- sh.toSeq if r % 2 == 0
      inter = (si & sr).size
      if inter.toDouble / (si.size + sr.size - inter) >= 0.7
    } yield (i, r)).sorted
    assert(got == want && got.nonEmpty)
  }

  test("probe plan prunes index partitions to the hit-dir set") {
    val docs = Tables.documents(spark, dir)
    val ref = docs.filter(col("doc_id") % 2 === 0)
    // one incoming doc -> its buckets hit a strict subset of dirs
    val inc = docs.filter(col("doc_id") === 1)
    val tmp = Files.createTempDirectory("lshprune").toFile.getAbsolutePath
    LshIndex.save(LshIndex.build(ref, "doc_id", "text", 3), s"$tmp/idx")
    val idx = LshIndex.load(spark, s"$tmp/idx")
    val plan = LshIndex.probe(idx, ref, inc, "doc_id", "text", 0.7)
      .queryExecution.executedPlan.toString
    // FileSourceScanExec prints "PartitionFilters: []" even with zero
    // pruning (r12 ADVICE), so assert the filter CONTENT: a non-empty
    // bracket mentioning dir, i.e. the isin list was pushed to the
    // partition level rather than evaluated post-scan.
    val pushed = "PartitionFilters: \\[[^\\]]*dir[^\\]]*\\]".r
    assert(pushed.findFirstIn(plan).isDefined,
      s"probe scan must carry a NON-EMPTY partition filter on dir:\n$plan")
  }
}
