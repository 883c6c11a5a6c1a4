package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Properties pinning the oracle-less operators (q26 simhash, q29 ann)
  * and the LSH-vs-brute equivalence that backs q25's shared oracle.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir)

  test("minhash-LSH verified pairs equal brute-force truth at J>=0.7") {
    val brute = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh == brute)
  }

  test("simhash: near-dup pairs have small Hamming distance, random pairs large") {
    val bits = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val nearDups = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nearDists = nearDups.map { case (a, b) => hamming(bits(a), bits(b)) }
    assert(nearDists.nonEmpty && nearDists.forall(_ <= 12))
    // random non-dup pairs: distance concentrated near 32
    val ids = bits.keys.toSeq.sorted.take(40)
    val dupSet = nearDups.toSet
    val randomDists = for {
      a <- ids; b <- ids if a < b && !dupSet.contains((a, b))
    } yield hamming(bits(a), bits(b))
    assert(randomDists.sum.toDouble / randomDists.size > 15.0)
  }

  test("simhashNearDup equals brute-force Hamming search for dist <= bands-1") {
    import graft.functions.Hashing
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val sigs = texts.map { case (id, t) =>
      id -> Hashing.simhash64(t.trim.toLowerCase.split("\\s+").map(Hashing.stringHash64))
    }.toMap
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= 7
    } yield (a, b, d)).toSet
    val got = Dedup.simhashNearDup(docs, "doc_id", "text", maxDist = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the planted near-dups are simhash-close too
  }

  test("exact dedup groups: one group per distinct text") {
    val n = docs.count()
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() <= n)
    assert(groups.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0) == n)
  }

  test("IVF ANN: self first, scores exact, high recall vs brute top-10") {
    val emb = Tables.embeddings(spark, dir)
    val brute10 = Similarity.knnBruteForce(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val bruteAll = Similarity.knnBruteForce(emb, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.annIvf(emb, 0L, 10, nlist = 8, nProbe = 3).collect()
    assert(ivf.head.getLong(0) == 0L)
    ivf.foreach(r => assert(math.abs(bruteAll(r.getLong(0)) - r.getDouble(1)) < 1e-12))
    val recall = ivf.count(r => brute10.contains(r.getLong(0))).toDouble / 10
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("ANN bucket results are a subset of brute-force ranking, self first") {
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.knnBruteForce(emb, 0L, 20).collect()
    assert(brute.head.getLong(0) == 0L)
    assert(math.abs(brute.head.getDouble(1) - 1.0) < 1e-12)
    val bruteAll = Similarity.knnBruteForce(emb, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annHyperplaneLsh(emb, 0L, 10, bits = 8).collect()
    assert(ann.nonEmpty && ann.head.getLong(0) == 0L)
    ann.foreach { r =>
      assert(math.abs(bruteAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }
}
