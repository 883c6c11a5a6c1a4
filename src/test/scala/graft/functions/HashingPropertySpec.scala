package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the JVM hashing kernels that underpin the dedup /
  * similarity operators. These kernels have no SQL oracle (xxhash-style
  * mixing has no DuckDB twin), so their LAWS are pinned here instead:
  * determinism, permutation/banding structure, and the MinHash estimator's
  * agreement with true Jaccard.
  */
class HashingPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val words: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa"))

  test("shingleSet: distinct, ordered windows; short docs collapse to one gram") {
    forAll(Gen.zip(words, Gen.choose(2, 6))) { case (ws, k) =>
      val text = ws.mkString(" ")
      val got = Hashing.shingleSet(text, k)
      assert(got.distinct.length == got.length)
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length >= k) {
        val expected = toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
        assert(got.toSeq == expected)
      } else assert(got.toSeq == Seq(toks.mkString(" ")))
    }
  }

  test("minhashSignature: deterministic; signature of a union is elementwise min") {
    forAll(Gen.zip(words, words)) { case (a, b) =>
      val ha = a.distinct.map(Hashing.stringHash64).toArray
      val hb = b.distinct.map(Hashing.stringHash64).toArray
      if (ha.nonEmpty && hb.nonEmpty) {
        val sa = Hashing.minhashSignature(ha, 64)
        val sb = Hashing.minhashSignature(hb, 64)
        assert(sa.sameElements(Hashing.minhashSignature(ha, 64)))
        // structural law making banded LSH sound: sig(A ∪ B) = min(sig(A), sig(B))
        val su = Hashing.minhashSignature((ha ++ hb).distinct.toArray, 64)
        assert(su.toSeq == sa.zip(sb).map(t => math.min(t._1, t._2)).toSeq)
      }
    }
  }

  test("minhash estimate tracks true Jaccard within sampling error") {
    // deterministic word sets with controlled overlap
    for (overlap <- Seq(0.0, 0.3, 0.7, 1.0)) {
      val n = 200
      val shared = (0 until (n * overlap).toInt).map(i => s"s$i")
      val a = (shared ++ (0 until n - shared.length).map(i => s"a$i")).toArray
      val b = (shared ++ (0 until n - shared.length).map(i => s"b$i")).toArray
      val trueJ = shared.length.toDouble / (2 * n - shared.length)
      val sa = Hashing.minhashSignature(a.map(Hashing.stringHash64), 256)
      val sb = Hashing.minhashSignature(b.map(Hashing.stringHash64), 256)
      val est = sa.zip(sb).count(t => t._1 == t._2).toDouble / 256
      // 256 perms ⇒ σ = sqrt(J(1-J)/256) ≤ 0.032; allow 4σ
      assert(math.abs(est - trueJ) < 0.13, s"overlap=$overlap est=$est true=$trueJ")
    }
  }

  test("bandBuckets: equal band-slices collide, band index is encoded") {
    forAll(Gen.listOfN(32, Gen.long)) { sig0 =>
      val sig = sig0.toArray
      val bands = 8
      val ba = Hashing.bandBuckets(sig, bands)
      assert(ba.length == bands)
      // same signature → same buckets (determinism)
      assert(ba.sameElements(Hashing.bandBuckets(sig, bands)))
      // different bands never share a bucket key even with equal content:
      // the band index participates in the bucket hash
      val uniform = Array.fill(32)(42L)
      assert(Hashing.bandBuckets(uniform, bands).distinct.length == bands)
    }
  }

  test("hyperplaneBandBuckets: deterministic; scaling a vector preserves signs") {
    val gen = Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 500.0f))
    forAll(gen) { v0 =>
      val v = v0.toSeq
      if (v.exists(_ != 0f)) {
        val b1 = Hashing.hyperplaneBandBuckets(v, 4, 16)
        assert(b1.sameElements(Hashing.hyperplaneBandBuckets(v, 4, 16)))
        // cosine LSH depends only on direction: positive scaling is invariant
        val scaled = v.map(x => x * 3.0f)
        assert(b1.sameElements(Hashing.hyperplaneBandBuckets(scaled, 4, 16)))
      }
    }
  }

  test("simhash64: near-identical token sets have small Hamming distance") {
    val base = (0 until 100).map(i => s"tok$i")
    val ha = base.map(Hashing.stringHash64).toArray
    val hb = (base.take(95) ++ Seq("x1", "x2", "x3", "x4", "x5"))
      .map(Hashing.stringHash64).toArray
    val d = java.lang.Long.bitCount(Hashing.simhash64(ha) ^ Hashing.simhash64(hb))
    assert(d <= 16, s"5% token change moved $d/64 simhash bits")
    // disjoint sets should be near-independent (≈32 bits differ)
    val hc = (0 until 100).map(i => s"other$i").map(Hashing.stringHash64).toArray
    val d2 = java.lang.Long.bitCount(Hashing.simhash64(ha) ^ Hashing.simhash64(hc))
    assert(d2 >= 16, s"independent sets only $d2/64 bits apart")
  }
}
