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

  test("prefix-filtered exact Jaccard join equals brute-force truth (pairs AND scores)") {
    val brute = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty)
    assert(pref == brute)
    // The rewrite must not reintroduce a quadratic plan: no cartesian /
    // nested-loop join anywhere in the physical plan.
    val plan = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 3, 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("prefix-filtered Jaccard join: boundary prefix lengths still catch every pair") {
    // Tiny synthetic sets where ceil(t*n) sits exactly on an integer
    // (the IEEE-drift corner the 1e-9 epsilon guards): 10 shingles at
    // t=0.7 -> prefix 4; a pair sharing exactly 7 of 10 tokens has
    // J = 7/13 < 0.7, while 9-of-10 overlap (J = 9/11 >= 0.7) must
    // surface even if the shared tokens sort LAST in the global order.
    import spark.implicits._
    val a = (1 to 10).map(i => s"t$i").mkString(" ")            // t1..t10
    val b = (2 to 10).map(i => s"t$i").mkString(" ") + " t11"   // 9 shared
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // k=1 shingles = tokens
    val brute = Dedup.jaccardBrute(df, "doc_id", "text", 1, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref = Dedup.jaccardPrefixJoin(df, "doc_id", "text", 1, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == Set((1L, 2L)))
    assert(pref == brute)
  }

  test("prefix-filtered Jaccard join == brute on randomized corpora across k and thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val params = Seq((1, 0.5), (2, 0.7), (3, 0.8), (2, 0.95), (3, 0.7), (1, 0.9))
    params.zipWithIndex.foreach { case ((k, t), trial) =>
      val vocab = (1 to (8 + rnd.nextInt(12))).map(i => s"w$i")
      val nDocs = 10 + rnd.nextInt(12)
      val base = (1 to nDocs).map { id =>
        (id.toLong,
          Seq.fill(5 + rnd.nextInt(22))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // plant near-dups: copy ~1/3 of docs with a 0-2 token mutation
      val planted = base.filter(_._1 % 3 == 0).map { case (id, text) =>
        val toks = text.split(" ").toBuffer
        (0 until rnd.nextInt(3)).foreach { _ =>
          toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
        }
        (id + 1000L, toks.mkString(" "))
      }
      val docs = (base ++ planted).toDF("doc_id", "text")
      val brute = Dedup.jaccardBrute(docs, "doc_id", "text", k, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", k, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == brute, s"trial $trial (k=$k t=$t): " +
        s"missing=${(brute -- pref).take(3)} extra=${(pref -- brute).take(3)}")
    }
  }

  test("DOPH minhash-LSH matches brute-force truth (one-pass signature, same recall)") {
    val brute = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val doph = Dedup.minhashLshDoph(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(doph == brute)
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
      id -> Hashing.simhash64(Hashing.md5TokenHashes(t.trim.toLowerCase.split("\\s+")))
    }.toMap
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong if d <= 7
    } yield (a, b, d)).toSet
    val got = Dedup.simhashNearDup(docs, "doc_id", "text", maxDist = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the planted near-dups are simhash-close too
  }

  test("connectedComponents: transitive chains merge, singletons stay (both paths)") {
    import spark.implicits._
    // chain 1-2-3 (1-3 is NOT an edge — only transitivity links them),
    // pair 5-6, isolated 4
    val edges = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // threshold default → driver union-find; 0 → distributed min-label
    for (threshold <- Seq(1000000L, 0L)) {
      val got = Dedup.connectedComponents(edges, vertices, threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L),
        s"localEdgeThreshold=$threshold")
    }
  }

  test("connectedComponents: string vertex ids converge on both paths") {
    import spark.implicits._
    // Chain a-b-c needs TWO min-label rounds (a-c is not an edge). String
    // labels cast to NULL under the decimal-sum convergence shortcut, which
    // would read "stable" after round one and leave c under-merged at b —
    // the join-based changed-count fallback must carry it to the fixpoint.
    val edges = Seq(("b", "a"), ("b", "c"), ("f", "e")).toDF("src", "dst")
    val vertices = Seq("a", "b", "c", "d", "e", "f").toDF("id")
    for (threshold <- Seq(1000000L, 0L)) {
      val got = Dedup.connectedComponents(edges, vertices, threshold)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
        "d" -> "d", "e" -> "e", "f" -> "e"), s"localEdgeThreshold=$threshold")
    }
  }

  test("connectedComponents: deep chain converges in logarithmic rounds (shortcutting)") {
    import spark.implicits._
    // A single path component of 1025 vertices (diameter 1024), ids
    // shuffled so labels must genuinely travel: plain min-label
    // propagation needs ~diameter shuffle rounds, and the r10–r12
    // single-application shortcut needed a measured 349. Assert the
    // ROUND COUNT, not seconds — a wall-clock budget flakes under box
    // contention (r12: 193.7 s on unchanged code) while rounds are
    // deterministic. Contraction + compression: super-nodes at least
    // halve per level (~3× expected on random ids), each level costs a
    // hook + a handful of compress joins + a contract — measured 32
    // total shuffle rounds on this graph; 40 is the regression alarm,
    // an order below diameter.
    val n = 1025
    val perm = new scala.util.Random(7).shuffle((0 until n).toVector)
    val edges = (0 until n - 1)
      .map(i => (perm(i).toLong, perm(i + 1).toLong)).toDF("src", "dst")
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val got = Dedup.connectedComponents(edges, vertices, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
    val rounds = Dedup.lastDistributedRounds.get()
    assert(rounds <= 40, s"distributed CC took $rounds rounds on a " +
      s"diameter-1024 chain — contraction/compression regressed?")
  }

  test("dedupAgainst: exact/near history dups and batch-internal dups all removed") {
    import spark.implicits._
    def words(n: Int, tag: String) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val base = words(20, "w")                       // history doc 1
    val nearBase = words(19, "w") + " zzz"          // ~0.89 Jaccard vs base
    val other = words(20, "x")                      // history doc 2
    val novelA = words(20, "a")
    val novelB = words(20, "b")
    val nearNovelA = words(19, "a") + " qqq"        // in-batch near-dup of novelA
    val history = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),        // exact dup of history → dropped (tier 1)
      (11L, nearBase),    // near-dup of history → dropped (tier 2)
      (12L, novelA),      // novel → kept
      (13L, nearNovelA),  // in-batch near-dup of 12 → dropped (tier 3)
      (14L, novelB),      // novel → kept
      (15L, novelB)       // exact in-batch dup of 14 → dropped (tier 1)
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(history, incoming, "doc_id", "text",
      k = 3, threshold = 0.6).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(12L, 14L))
  }

  test("q64 cohesion: cosines bounded, singleton labels score 1") {
    val rows = graft.queries.EmbeddingQueries
      .q64(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c) => assert(c >= -1.0001 && c <= 1.0001) }
    // a label with exactly one vector has that vector AS its centroid
    val labelSizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val singletons = rows.filter(r => labelSizes(r._2) == 1)
    singletons.foreach { case (_, _, c) => assert(math.abs(c - 1.0) < 1e-3) }
  }

  test("dedupClusters agrees with union-find over the brute-force pairs") {
    val pairs = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup.dedupClusters(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.values.toSet.size < ids.length) // some real merging happened
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

  test("IVF assignment is a codegen expression — no Scala UDF in the plan") {
    val emb = Tables.embeddings(spark, dir)
    val plan = Similarity.annIvf(emb, 0L, 10, nlist = 8, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan.linesIterator.take(10).mkString("\n"))
    // r9: assignment runs on the fixed-point quantizer's packed argmin
    // (KMeans.assign) — still a codegen expression, different name
    assert(plan.contains("graft_centroid_packed_argmin"), plan.take(2000))
  }

  test("annIvf is partition-invariant (the r9 fixed-point quantizer is bit-deterministic)") {
    val emb = Tables.embeddings(spark, dir)
    val a = Similarity.annIvf(emb, 0L, 10, nlist = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Similarity.annIvf(emb.repartition(17), 0L, 10, nlist = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a.nonEmpty && a == b,
      "IVF results changed under repartitioning — quantizer not deterministic")
  }

  test("multi-probe LSH: results subset of brute ranking, recall >= single bucket") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val brute10 = Similarity.knnBruteForce(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val bruteAll = Similarity.knnBruteForce(emb, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val single = Similarity.annHyperplaneLsh(emb, 0L, 10, bits = 8)
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.annHyperplaneLshMultiProbe(emb, 0L, 10, bits = 8)
      .collect()
    assert(multi.nonEmpty && multi.head.getLong(0) == 0L)
    // exact scores (same oracle family as every ANN path)
    multi.foreach(r =>
      assert(math.abs(bruteAll(r.getLong(0)) - r.getDouble(1)) < 1e-12))
    // probing a SUPERSET of buckets can only improve recall
    val rs = multi.map(_.getLong(0)).count(brute10.contains)
    val rsSingle = single.count(brute10.contains)
    assert(rs >= rsSingle,
      s"multi-probe recall $rs < single-bucket $rsSingle")
    // and the scanned set truly is a superset: every single-bucket hit
    // appears among the multi-probe candidates when k allows
    val multiIds = multi.map(_.getLong(0)).toSet
    val cosOf = bruteAll
    val worstMulti = multi.map(r => cosOf(r.getLong(0))).min
    single.foreach { id =>
      assert(multiIds.contains(id) || cosOf(id) < worstMulti,
        s"single-bucket hit $id vanished from multi-probe output")
    }
  }

  test("IVF index lifecycle: build once, search by vector, save/load parity") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val idx = Similarity.buildIvfIndex(emb, nlist = 8, iters = 3)
    val qv = emb.filter(col("vec_id") === 0L).head()
      .getAs[Seq[Float]]("embedding").toArray
    val direct = Similarity.annIvf(emb, 0L, 10, nlist = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaIndex = Similarity.searchIvf(idx, qv, 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == direct, "search of a prebuilt index must equal the one-shot form")
    val tmp = java.nio.file.Files.createTempDirectory("ivfidx").toFile.getAbsolutePath
    Similarity.saveIvfIndex(idx, tmp)
    val loaded = Similarity.loadIvfIndex(spark, tmp)
    assert(loaded.model.scale == idx.model.scale)
    assert(loaded.model.centroids.map(_.toSeq).toSeq ==
      idx.model.centroids.map(_.toSeq).toSeq)
    val viaLoaded = Similarity.searchIvf(loaded, qv, 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaLoaded == direct, "persisted index must search identically")
    // a NON-corpus query vector works too (the one-shot form can't do this)
    val perturbed = qv.map(x => x * 0.5f)
    val alt = Similarity.searchIvf(loaded, perturbed, 5, nProbe = 3).collect()
    assert(alt.length == 5)
    assert(alt.head.getLong(0) == 0L) // cosine is scale-invariant: self still nearest
  }

  test("batch IVF search equals per-query searchIvf for every query in the slice") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val idx = Similarity.buildIvfIndex(emb, nlist = 8, iters = 3)
    val queries = emb.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val batch = Similarity.searchIvfBatch(idx, queries, 5, nProbe = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    val qIds = queries.collect().map(_.getLong(0))
    assert(qIds.nonEmpty && batch.keySet == qIds.toSet)
    qIds.foreach { q =>
      val qv = emb.filter(col("vec_id") === q).head()
        .getAs[Seq[Float]]("embedding").toArray
      // single-query path includes the query itself; ask for k+1 and
      // drop it — probe selection AND scores must agree bit-for-bit
      val single = Similarity.searchIvf(idx, qv, 6, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .filter(_._1 != q).take(5).toSeq
      assert(batch(q) == single, s"batch vs single mismatch for q=$q")
    }
  }

  test("mergeIvf: replace + append semantics, search parity with assign-the-union") {
    import org.apache.spark.sql.functions.{col, transform}
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
      .unionByName(emb.filter(col("vec_id") % 40 === 1)
        .withColumn("embedding", transform(col("embedding"), x => -x)))
    val idx = Similarity.buildIvfIndex(base, nlist = 8, iters = 3)
    val merged = Similarity.mergeIvf(idx, delta)
    // exactly one row per vec_id: re-embedded ids REPLACED, not duplicated
    val dupIds = merged.tagged.groupBy("vec_id")
      .count().filter(col("count") > 1).count()
    assert(dupIds == 0, s"$dupIds vec_ids appear twice after merge")
    assert(merged.tagged.count() == emb.count())
    // a replaced id carries the DELTA's vector
    val rid = emb.filter(col("vec_id") % 40 === 1)
      .orderBy("vec_id").head().getLong(0)
    val orig = emb.filter(col("vec_id") === rid).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toList
    val now = merged.tagged.filter(col("vec_id") === rid).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toList
    assert(now == orig.map(x => -x), s"vec $rid not replaced by delta version")
    // plumbing parity: merge == assign-the-union under the same frozen model
    val union = emb.filter(col("vec_id") % 40 =!= 1)
      .unionByName(emb.filter(col("vec_id") % 40 === 1)
        .withColumn("embedding", transform(col("embedding"), x => -x)))
    val viaAssign = Similarity.IvfIndex(idx.model,
      union.join(KMeans.assign(union, idx.model)
        .select(col("vec_id"), col("cluster_id").as("cluster")), "vec_id"))
    val queries = union.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    def res(ix: Similarity.IvfIndex) =
      Similarity.searchIvfBatch(ix, queries, 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(res(merged) == res(viaAssign))
  }

  test("IVF-PQ: recall >= plain IVF at the same probes, 8x+ smaller scan rows") {
    val emb = Tables.embeddings(spark, dir)
    val brute10 = Similarity.knnBruteForce(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val bruteAll = Similarity.knnBruteForce(emb, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf10 = Similarity.annIvf(emb, 0L, 10, nlist = 8, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val pq = Similarity.annIvfPq(emb, 0L, 10, nlist = 8, nProbe = 3).collect()
    assert(pq.head.getLong(0) == 0L) // self survives the ADC shortlist
    // reported scores are EXACT (rerank on real vectors), same oracle
    // as the other ANN paths
    pq.foreach(r =>
      assert(math.abs(bruteAll(r.getLong(0)) - r.getDouble(1)) < 1e-12))
    val recallPq = pq.count(r => brute10.contains(r.getLong(0))).toDouble / 10
    val recallIvf = ivf10.count(brute10.contains).toDouble / 10
    assert(recallPq >= recallIvf,
      s"PQ shortlist lost recall: pq=$recallPq ivf=$recallIvf")
    // the probe representation really is >= 8x smaller than the vectors:
    // m=8 one-byte codes vs 64 floats (256 bytes) per scanned row
    val dim = emb.head().getAs[Seq[Float]]("embedding").length
    assert(8 <= dim * 4 / 8, s"PQ code not 8x smaller at dim $dim")
  }

  test("embedNearDupLsh (exactness-tuned) equals the brute-force q30 truth") {
    val emb = Tables.embeddings(spark, dir)
    val brute = graft.queries.EmbeddingQueries.q30(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embedNearDupLsh(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty)
    // same pairs AND bit-identical cosines (shared fused expression)
    assert(lsh == brute)
    // both verify placements agree (in-join verify = q36's shape)
    val inJoin = Dedup.embedNearDupLsh(emb, "vec_id", "embedding", 0.45,
        verifyInJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inJoin == brute)
  }

  test("embedNearDup regime dispatch: brute below separation, banded above") {
    // τ=0.45 is near the random-pair regime (sign-LSH collision prob for a
    // random pair is 1/2; exactness-tuned banding there joins MORE rows
    // than the cross join) → no banding scheme qualifies.
    assert(Dedup.bandingFor(0.45).isEmpty)
    assert(Dedup.bandingFor(0.6).isEmpty)
    // Separable thresholds get a scheme that both keeps the 1e-5 miss
    // bound and prunes ≥4× with a bounded explode factor.
    for (t <- Seq(0.7, 0.8, 0.9, 0.95)) {
      val Some((bits, bands)) = Dedup.bandingFor(t)
      val p = 1.0 - math.acos(t) / math.Pi
      val missProb = math.pow(1.0 - math.pow(p, bits), bands)
      assert(missProb <= 1e-5, s"t=$t: miss $missProb")
      assert(bands <= 512 && bands.toDouble / (1L << bits) <= 0.25,
        s"t=$t: ($bits, $bands) does not prune")
    }
    // Both regimes are exact: adaptive == brute at a separable threshold
    // (banded path) and at the noise threshold (all-pairs path).
    val emb = Tables.embeddings(spark, dir)
    for (t <- Seq(0.45, 0.7)) {
      val adaptive = Dedup.embedNearDup(emb, "vec_id", "embedding", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = Dedup.embedNearDupBrute(emb, "vec_id", "embedding", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(adaptive == brute)
    }
  }

  test("embedNearDup non-separable escape hatch: blocked above the row bound") {
    // r14 verdict #7: the documented quadratic regime (τ=0.45,
    // bandingFor → None) needs a scale path a 100 TB caller actually
    // gets. Below the bound the plan stays exact all-pairs; above it
    // (forced here with a tiny bruteMaxRows) the blocked generator runs:
    // precision stays 1.0 (every emitted pair is a true τ-pair with the
    // bit-identical fused cosine), recall is bounded by block purity.
    val emb = Tables.embeddings(spark, dir)
    val brute = Dedup.embedNearDupBrute(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Dedup.embedNearDup(emb, "vec_id", "embedding", 0.45,
        bruteMaxRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty)
    assert(blocked.nonEmpty, "blocked generator found no pairs at all")
    assert(blocked.subsetOf(brute),
      "blocked emitted a pair the exact kernel rejects (precision < 1)")
    // and the default bound leaves bench-scale inputs on the exact path
    val exact = Dedup.embedNearDup(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact == brute)
  }

  test("blocked escape hatch: measured recall band on a planted near-dup corpus") {
    // r15 verdict #6: the auto-switch log says "recall < 1 by design" —
    // this spec gives that statement a NUMBER. 1500 deterministic
    // random 128-dim vectors (at dim 128 random cosines sit ~5σ below
    // 0.45, so the brute ground truth is exactly the planted pairs)
    // plus 300 planted pairs at three cosine tiers (~0.95 / ~0.75 /
    // ~0.55 — the spectrum of the non-separable θ=0.45 regime). Recall
    // = |blocked| / |brute| (precision is 1 by the subset law, pinned
    // in the spec above); the block count (~28 at targetBlockRows=64)
    // is scale-representative — at the DEFAULT 8192 target the same
    // n·target pair-work ratio holds, with FEWER blocks, so this band
    // is conservative for real callers.
    import graft.functions.Hashing
    val dim = 128
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(dim) { i =>
        ((Hashing.splitmix64(seed * 7919 + i) >>> 11).toDouble /
          (1L << 53).toDouble - 0.5)
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def blend(base: Array[Float], seed: Long, alpha: Double): Array[Float] = {
      val noise = unit(seed)
      val v = base.zip(noise).map { case (b, e) => alpha * b + (1 - alpha) * e }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rand = (0 until 1500).map(i => (i.toLong, unit(i + 1)))
    // pair tiers: alpha tunes the planted cosine (empirically ~0.97 /
    // ~0.86 / ~0.62 at these blends — all above θ=0.45)
    val planted = (0 until 300).flatMap { j =>
      val base = unit(10000 + j)
      val alpha = j % 3 match { case 0 => 0.95; case 1 => 0.75; case _ => 0.55 }
      Seq((2000L + 2 * j, base),
        (2000L + 2 * j + 1, blend(base, 20000 + j, alpha)))
    }
    import spark.implicits._
    val emb = (rand ++ planted).toDF("vec_id", "embedding")
    val brute = Dedup.embedNearDupBrute(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.embedNearDupBlocked(emb, "vec_id", "embedding",
        0.45, rowCount = 2100L, targetBlockRows = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute))
    val recall = blocked.size.toDouble / brute.size
    info(f"blocked recall at ~${(2100 + 63) / 64} blocks: $recall%.3f " +
      f"(${blocked.size}/${brute.size} pairs)")
    // per-tier recall: high-cosine pairs co-block most reliably
    def tierRecall(m: Int): Double = {
      val tier = (0 until 300).filter(_ % 3 == m)
        .map(j => (2000L + 2 * j, 2000L + 2 * j + 1)).toSet
      val tb = tier.count(brute)
      if (tb == 0) 1.0 else tier.count(blocked).toDouble / tb
    }
    info(f"tier recall: cos~.97 ${tierRecall(0)}%.3f, " +
      f"cos~.86 ${tierRecall(1)}%.3f, cos~.62 ${tierRecall(2)}%.3f")
    // the pinned band the runtime log cites (deterministic corpus +
    // deterministic lowest-id k-means seeding => a stable number)
    assert(recall >= 0.80, f"blocked recall $recall%.3f fell below the band")
  }

  test("embedNearDupLsh (pruning-tuned) finds planted near-dups and prunes noise") {
    import graft.functions.Hashing
    // 200 deterministic random unit-ish vectors + 10 planted near-dups
    // (small perturbation → cos > 0.95); τ=0.9 with 16-bit × 32-band keys.
    val dim = 64
    def vec(seed: Long): Array[Float] = Array.tabulate(dim) { i =>
      ((Hashing.splitmix64(seed * 1000 + i) >>> 11).toDouble /
        (1L << 53).toDouble - 0.5).toFloat
    }
    val base = (0 until 200).map(i => i.toLong -> vec(i.toLong))
    val planted = (0 until 10).map { i =>
      val src = base(i)._2
      val p = vec(9000L + i)
      (1000L + i) -> src.zip(p).map { case (x, e) => x + 0.05f * e }
    }
    val all = base ++ planted
    import spark.implicits._
    val df = all.toDF("vec_id", "embedding")
    val got = Dedup.embedNearDupLsh(df, "vec_id", "embedding",
        threshold = 0.9, bitsPerBand = 16, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    assert(got == expected)
    // pruning: candidate pairs (any shared band bucket) are a tiny
    // fraction of the 22155-pair space — the point of the banding.
    val buckets = all.map { case (id, v) =>
      id -> Hashing.hyperplaneBandBuckets(v.toSeq, 16, 32).toSet
    }
    val candidates = for {
      (a, ba) <- buckets; (b, bb) <- buckets
      if a < b && ba.exists(bb.contains)
    } yield (a, b)
    assert(candidates.size < 300, s"candidate space not pruned: ${candidates.size}")
    assert(expected.forall(candidates.toSet.contains))
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

  test("semanticDedup: keep flags match a local within-cluster replica") {
    val emb = Tables.embeddings(spark, dir)
    val thr = 0.45
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding",
      k = 8, iterations = 2, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // cluster truth comes from the already-pinned KMeans.fit
    val cid = KMeans.fit(emb, k = 8, iterations = 2).assignments
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(out.length == vecs.size) // one row per vector
    out.foreach { case (id, c, kept) =>
      assert(c == cid(id))
      val hasLowerDup = vecs.keys.exists(o =>
        o < id && cid(o) == c && cos(vecs(o), vecs(id)) >= thr)
      assert(kept == !hasLowerDup,
        s"vec $id kept=$kept but lower-id same-cell dup exists=$hasLowerDup")
    }
    // sanity: the threshold actually bites on this data
    assert(out.exists(!_._3), "expected at least one dropped vector")
  }
}
