package graft.operators

import graft.functions.{CosineSimilarity, VectorFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over `ArrayType(FloatType)` embedding columns
  * (SURVEY.md §7.4). Two paths:
  *
  *  - [[knnBruteForce]]: exact top-k by cosine — broadcast the (small) query
  *    set against the corpus; one pass, no shuffle except the final top-k.
  *    At 100 TB this is the map-side of a distributed exact k-NN: per
  *    partition top-k then global TakeOrdered (Spark's `orderBy.limit` plans
  *    exactly that).
  *  - [[annHyperplaneLsh]]: random-hyperplane LSH bucketing; queries only
  *    compare against corpus vectors in the same bucket (and optionally
  *    neighboring buckets via multi-probe) — the scale path when the corpus
  *    is too large for exhaustive scans.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` vectors against one query vector
    * (selected by id from the same table). Returns (vec_id, cos) rows.
    */
  def knnBruteForce(corpus: DataFrame, queryId: Long, k: Int): DataFrame = {
    val query = corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    corpus.crossJoin(broadcast(query))
      .select(col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN index: k-means-lite coarse quantizer.
    *
    * Build: deterministic seeding (the `nlist` lowest vec_ids), then
    * `iters` Lloyd rounds — assignment is a broadcast argmax against the
    * centroids; the update step averages member vectors per centroid via
    * posexplode + (cluster, dim) aggregation, i.e. one shuffle of
    * (cluster, dim, value) triples per round, never of whole vectors.
    * Query: probe the `nProbe` nearest centroid lists only — at corpus
    * scale the scan cost drops by ~nlist/nProbe vs brute force while
    * recall is tunable, the standard IVF trade.
    *
    * Returns the top-k rows among probed lists as (vec_id, cos).
    */
  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Tag every row with its max-cosine centroid via the codegen
    * [[graft.functions.CentroidArgmax]] — the assignment scan stays in
    * WholeStageCodegen (no Scala UDF in the plan; pinned by
    * OperatorsSpec). `element_at` maps the matrix position back to the
    * centroid's id (recompute can drop emptied centroids, so position
    * and id may diverge).
    */
  private def assignClusters(df: DataFrame,
                             centroids: Array[(Int, Array[Float])]): DataFrame = {
    val idx = graft.functions.CentroidArgmax(
      df.sparkSession, col("embedding"), centroids.map(_._2))
    df.withColumn("cluster",
      element_at(typedLit(centroids.map(_._1).toSeq), idx + 1))
  }

  /** Deterministic coarse-quantizer fit shared by [[annIvf]] and
    * [[annIvfPq]]: seed with the `nlist` lowest vec_ids, then Lloyd
    * rounds — assignment is the codegen argmax; the update step shuffles
    * (cluster, dim, value) triples once per round, never whole vectors,
    * and the nlist×dim means assemble driver-side (bounded, like the
    * BPE merge loop).
    */
  private def trainCoarse(corpus: DataFrame, nlist: Int,
                          iters: Int): Array[(Int, Array[Float])] = {
    def recompute(df: DataFrame): Array[(Int, Array[Float])] = {
      val rows = df
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim").agg(avg(col("x")).as("m"))
        .collect()
      rows.groupBy(_.getInt(0)).map { case (cid, rs) =>
        val arr = new Array[Float](rs.length)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2).toFloat)
        cid -> arr
      }.toArray
    }
    var centroids: Array[(Int, Array[Float])] =
      corpus.orderBy("vec_id").limit(nlist).collect().zipWithIndex.map {
        case (r, i) => i -> r.getAs[Seq[Float]]("embedding").toArray
      }
    (1 until iters).foreach { _ =>
      centroids = recompute(assignClusters(corpus, centroids))
    }
    centroids
  }

  /** Multi-probe hyperplane-LSH ANN (Lv et al., VLDB'07 lite): scan the
    * query's bucket AND every bucket whose signature differs in at most
    * one bit — a sign bit near zero projection is exactly the bit most
    * likely to differ for a true neighbor, so probing the `bits`
    * Hamming-1 neighbors recovers most of what a single bucket misses
    * at (bits+1)× the scan cost, still ~2^bits/(bits+1) cheaper than
    * brute force. Deterministic (md5-derived planes, same as
    * [[annHyperplaneLsh]]) ⇒ exact SQL oracle: the replay keeps rows
    * whose replayed signature is within Hamming distance 1 of the
    * query's. Recall ≥ the single-bucket form by construction
    * (superset of scanned buckets) — pinned by spec.
    */
  def annHyperplaneLshMultiProbe(corpus: DataFrame, queryId: Long, k: Int,
                                 bits: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val signed = corpus.withColumn("sig",
      VectorFns.hyperplaneSignature(col("embedding"), bits))
    val qRow = signed.filter(col("vec_id") === queryId)
      .select(col("sig"), col("embedding")).head()
    val qSig = qRow.getString(0)
    val probes = qSig +: (0 until bits).map { b =>
      qSig.updated(b, if (qSig.charAt(b) == '1') '0' else '1')
    }
    val qDf = corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    signed.filter(col("sig").isin(probes: _*))
      .crossJoin(broadcast(qDf))
      .select(col("vec_id"),
        CosineSimilarity(spark, col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Sequential left-to-right double cosine — the fold the SQL oracle
    * replays elementwise (list_sum over i), for probe ranking against
    * fixed-point centroids scaled back to doubles.
    */
  private def cosLocalD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IVF ANN over the BIT-DETERMINISTIC coarse quantizer: since r9 the
    * nlist centroids come from [[KMeans.fit]]'s fixed-point integer
    * Lloyd (q92's engine) instead of the float-mean loop — an avg() of
    * doubles is partition-order-dependent, which is exactly why q34
    * could not have an exact oracle before. Now every step replays in
    * SQL: the Lloyd chain ([[KMeans.kmeansCentroidsSql]]), the
    * assignment pass (exact integer distances, ties to lower cid), the
    * probe ranking (cosine of the query against centroids/scale — one
    * deterministic double fold per centroid, ties to lower cid), and
    * the in-list exact cosine top-k. Approximate w.r.t. true kNN as any
    * IVF is (recall floor pinned by spec); the COMPUTATION is exact.
    */
  def annIvf(corpus: DataFrame, queryId: Long, k: Int,
             nlist: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val index = buildIvfIndex(corpus, nlist, iters)
    val qv = corpus.filter(col("vec_id") === queryId).head()
      .getAs[Seq[Float]]("embedding").toArray
    searchIvf(index, qv, k, nProbe)
  }

  /** A built IVF index: the trained fixed-point quantizer plus the
    * cluster-tagged corpus (the inverted lists). Build ONCE, search
    * many — [[annIvf]] is the one-shot driver-contract form that
    * retrains per call; a production consumer holds this instead.
    */
  final case class IvfIndex(model: KMeans.Model, tagged: DataFrame)

  /** Train the coarse quantizer and tag every corpus vector with its
    * list (one deterministic fit + one map-only codegen assignment
    * pass).
    */
  def buildIvfIndex(corpus: DataFrame, nlist: Int = 16,
                    iters: Int = 3): IvfIndex = {
    val model = KMeans.fit(corpus, nlist, iters).model
    // withCluster: tag in the same scan — a corpus ⋈ assign(corpus)
    // self-join here would shuffle the corpus twice for a value the
    // codegen argmin computes in-row
    IvfIndex(model, KMeans.withCluster(corpus, model))
  }

  /** Search a built index with an ARBITRARY query vector (not
    * restricted to corpus members): rank centroids by cosine (ties to
    * lower cid), scan the `nProbe` nearest lists, exact cosine top-k.
    */
  def searchIvf(index: IvfIndex, queryVec: Array[Float], k: Int,
                nProbe: Int = 4): DataFrame = {
    val spark = index.tagged.sparkSession
    val qv = queryVec.map(_.toDouble)
    val cents = index.model.centroids.map(_.map(_.toDouble / index.model.scale))
    val probeClusters = cents.zipWithIndex
      .map { case (c, cid) => cid -> cosLocalD(qv, c) }
      .sortBy(-_._2).take(nProbe).map(_._1).toSet
    import spark.implicits._
    val qDf = Seq(Tuple1(queryVec.toSeq)).toDF("q_embedding")
    index.tagged.filter(col("cluster").isin(probeClusters.toSeq: _*))
      .crossJoin(broadcast(qDf))
      .select(col("vec_id"),
        CosineSimilarity(spark, col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Incremental index maintenance — absorb a delta batch (new vectors
    * AND re-embedded versions of existing ones) into a built index
    * WITHOUT retraining the quantizer: delta rows are assigned with the
    * frozen model (one map-only codegen pass), rows whose vec_id
    * appears in the delta are dropped from the old lists via a
    * broadcast anti-join on the delta's id set (re-embed = replace, the
    * [[InvertedIndex.merge]] contract), and the delta's tagged rows are
    * unioned in. The untouched lists are never recomputed; the only
    * work proportional to the OLD corpus is the anti-join probe against
    * a broadcast hash of delta ids. Freezing the quantizer is the
    * standard IVF maintenance trade (FAISS `add` semantics): centroids
    * drift only on explicit retrain, which a pipeline schedules
    * separately.
    */
  def mergeIvf(index: IvfIndex, delta: DataFrame): IvfIndex = {
    val taggedDelta = KMeans.withCluster(delta, index.model)
    val kept = index.tagged.join(
      broadcast(delta.select(col("vec_id"))), Seq("vec_id"), "left_anti")
    IvfIndex(index.model, kept.unionByName(taggedDelta))
  }

  /** Batch search: route a WHOLE query table through the index in one
    * distributed pass (hard-negative mining, recall evaluation, bulk
    * kNN enrichment — anywhere the query side is a table, not a
    * vector). Three stages, none of which shuffles the corpus:
    *
    *  1. probe selection — queries × nlist centroids (centroids are a
    *     driver-held array, shipped as a broadcast-joined literal DF);
    *     per-query centroid cosine via the same sequential double
    *     folds as [[searchIvf]]'s `cosLocalD` (zip_with product +
    *     left-fold sum — the order the SQL oracle's `list_sum`
    *     replays), ranked (cos desc, cid asc), top `nProbe`;
    *  2. list scan — the (q_id, cid, query-vector) probe rows
    *     BROADCAST onto the tagged corpus (`cluster = cid` equi-join:
    *     over a [[loadIvfIndex]] layout this prunes at the partition-
    *     directory level); exact cosine via the codegen
    *     [[CosineSimilarity]] kernel;
    *  3. per-query top-k through the bounded-heap
    *     [[graft.functions.TopKRows]] aggregate (heaps merge through
    *     the exchange — the only shuffle is Q·k rows).
    *
    * Returns (q_id, rank, vec_id, cos): rank 1..k by (cos desc,
    * vec_id asc). Fully deterministic — exact SQL oracle (q144).
    *
    * `excludeSelf` drops corpus rows whose vec_id equals the query's
    * q_id — correct for self-evaluation queries (q144/q146, where the
    * query set IS a corpus slice and the trivial self-hit would mask
    * recall), but WRONG for an external query stream whose ids share
    * nothing with corpus ids: a coincidental id collision would
    * silently lose that (possibly top-1) neighbor, so
    * [[graft.streaming.DocStreams.annSearchBatcher]] passes false.
    */
  def searchIvfBatch(index: IvfIndex, queries: DataFrame, k: Int,
                     nProbe: Int = 4, qIdCol: String = "q_id",
                     qVecCol: String = "q_embedding",
                     excludeSelf: Boolean = true): DataFrame = {
    val spark = index.tagged.sparkSession
    import spark.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cents: Seq[(Int, Seq[Double])] = index.model.centroids.zipWithIndex
      .map { case (c, cid) => cid -> c.map(_.toDouble / index.model.scale).toSeq }
      .toSeq
    val centsDf = cents.toDF("cid", "ce")
    val qd = queries.select(col(qIdCol), col(qVecCol),
      transform(col(qVecCol), x => x.cast("double")).as("qe"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("cs").desc, col("cid"))
    val probes = qd.crossJoin(broadcast(centsDf))
      .withColumn("cs",
        dot(col("qe"), col("ce")) /
          (sqrt(dot(col("ce"), col("ce"))) * sqrt(dot(col("qe"), col("qe")))))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col(qIdCol), col("cid"), col(qVecCol))
    val scanned = index.tagged.join(broadcast(probes), col("cluster") === col("cid"))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col(qIdCol)) else scanned)
      .select(col(qIdCol),
        struct((-CosineSimilarity(spark, col("embedding"), col(qVecCol))).as("nc"),
          col("vec_id")).as("key"))
      .groupBy(qIdCol)
      .agg(graft.functions.TopKRows(spark, col("key"), k).as("top"))
      .select(col(qIdCol), posexplode(col("top")).as(Seq("r0", "kv")))
      .select(col(qIdCol), (col("r0") + 1).cast("long").as("rank"),
        col("kv.vec_id").as("vec_id"), (-col("kv.nc")).as("cos"))
  }

  /** Persist an index: the tagged corpus as parquet (the inverted
    * lists, partitioned by list so a probe prunes at the FILE level)
    * and the fixed-point centroids as one small parquet. The layout IS
    * the index — no serialization format beyond parquet.
    */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.tagged.sparkSession
    index.tagged.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$path/lists")
    import spark.implicits._
    val centroidRows: Seq[(Int, Seq[Long], Long)] =
      index.model.centroids.zipWithIndex
        .map { case (c, cid) => (cid, c.toSeq, index.model.scale) }.toSeq
    centroidRows.toDF("cid", "v", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index. Scans of a loaded index prune probed
    * lists via parquet partition pruning (`cluster=<cid>` directories).
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
    val scale = cents.head.getLong(2)
    val centroids = cents.sortBy(_.getInt(0))
      .map(_.getSeq[Long](1).toArray)
    IvfIndex(KMeans.Model(centroids, scale),
      spark.read.parquet(s"$path/lists"))
  }

  /** Deterministic local k-means for the PQ sub-quantizers (runs on a
    * bounded driver sample): seed with the first `k` content-distinct
    * vectors in sample order, argmin-L2 assignment, mean update, empty
    * clusters keep their previous centroid.
    */
  private def kmeansLocal(vecs: Array[Array[Float]], k: Int,
                          iters: Int): Array[Array[Float]] = {
    val seeds = vecs.map(_.toSeq).distinct.take(k).map(_.toArray)
    var cents = (seeds ++ Array.fill(k - seeds.length)(seeds.head)).take(k)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          val d = l2(v, cents(j)); if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(x => (x / counts(j)).toFloat)
      }
    }
    cents
  }

  /** IVF-PQ: the coarse quantizer of [[annIvf]] plus product
    * quantization of the residual scan — the memory-bound regime's
    * standard ANN index (Jégou, Douze & Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011).
    *
    * Index: each vector stores its coarse cluster and `m` bytes of PQ
    * code (one per subspace, argmin-L2 against a 256-max-entry
    * codebook). The probe scan reads (cluster, m bytes) per row — for
    * 64-dim float vectors with m=8 that is 8 bytes vs 256, a 32×
    * smaller probe footprint — and ranks by the codegen
    * [[graft.functions.PqAdcScore]] lookup-table approximation; only
    * the top `rerank`·k shortlist fetches real vectors for an exact
    * cosine rerank (so reported scores are exact and recall is
    * ADC-shortlist-bounded, not ADC-final). Codebooks fit on a bounded
    * deterministic sample (lowest `sampleN` vec_ids) driver-side —
    * the same bounded-collect budget as the coarse centroids.
    */
  def annIvfPq(corpus: DataFrame, queryId: Long, k: Int,
               nlist: Int = 16, nProbe: Int = 4, iters: Int = 3,
               m: Int = 8, ksub: Int = 16, rerank: Int = 8,
               sampleN: Int = 2048): DataFrame = {
    val spark = corpus.sparkSession
    require(ksub >= 1 && ksub <= 256, "PQ codes are single bytes")
    val centroids = trainCoarse(corpus, nlist, iters)

    val sample = corpus.orderBy("vec_id").limit(sampleN).collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { s =>
      kmeansLocal(sample.map(_.slice(s * dsub, (s + 1) * dsub)), ksub, 5)
    }

    val index = assignClusters(corpus, centroids)
      .select(col("vec_id"), col("cluster"),
        graft.functions.PqEncode(spark, col("embedding"), codebooks).as("code"))

    val qv = corpus.filter(col("vec_id") === queryId).head()
      .getAs[Seq[Float]]("embedding").toArray
    val probeClusters = centroids
      .map { case (cid, c) => cid -> cosLocal(qv, c) }
      .sortBy(-_._2).take(nProbe).map(_._1).toSet
    val qnorm = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val dotLut = Array.tabulate(m) { s =>
      codebooks(s).map { cw =>
        var d = 0.0; var i = 0
        while (i < dsub) { d += qv(s * dsub + i).toDouble * cw(i); i += 1 }
        (d / qnorm).toFloat
      }
    }
    val normLut = Array.tabulate(m) { s =>
      codebooks(s).map(cw => cw.map(x => x.toDouble * x).sum.toFloat)
    }

    val shortlist = index
      .filter(col("cluster").isin(probeClusters.toSeq: _*))
      .select(col("vec_id"),
        graft.functions.PqAdcScore(spark, col("code"), dotLut, normLut).as("adc"))
      .orderBy(desc("adc"), asc("vec_id"))
      .limit(rerank * k)

    val qDf = corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    shortlist.join(corpus.select("vec_id", "embedding"), "vec_id")
      .crossJoin(broadcast(qDf))
      .select(col("vec_id"),
        CosineSimilarity(spark, col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** ANN via random-hyperplane LSH: bucket all vectors by a `bits`-bit
    * signature, then exact cosine only within the query's bucket.
    * Recall < 1 by construction; verified against brute force in tests.
    */
  def annHyperplaneLsh(corpus: DataFrame, queryId: Long, k: Int, bits: Int = 8): DataFrame = {
    val signed = corpus.withColumn("sig", VectorFns.hyperplaneSignature(col("embedding"), bits))
    val query = signed.filter(col("vec_id") === queryId)
      .select(col("sig").as("q_sig"), col("embedding").as("q_embedding"))
    signed.join(broadcast(query), signed("sig") === query("q_sig"))
      .select(col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Per-dimension (min, range) fit for scalar int8 quantization — the
    * uniform affine quantizer every embedding store ships (FAISS
    * `ScalarQuantizer` QT_8bit, Milvus/pgvector int8): 4× smaller
    * vectors, exact-arithmetic encode. One pass; the exchange carries
    * `dim` rows per map task (partial min/max), never the corpus.
    * min/max over doubles are comparison-based — exact and
    * order-independent, so the fitted model is bit-identical across
    * partitionings and engines (no rounding needed anywhere).
    */
  def int8Stats(vectors: DataFrame, vecCol: String = "embedding"): DataFrame =
    vectors
      .select(posexplode(col(vecCol)).as(Seq("p", "v0")))
      .select((col("p") + 1).as("d"), col("v0").cast("double").as("v"))
      .groupBy("d")
      .agg(min("v").as("mn"), (max("v") - min("v")).as("rng"))

  /** Map-only scalar int8 encode against the broadcast [[int8Stats]]
    * model: `code = clamp(floor((v − mn) / rng · 255), 0, 255)` and the
    * midpoint dequantizer `v̂ = mn + (code + 0.5) · rng / 256`, with the
    * per-vector reconstruction MSE. Every step is a fixed left-to-right
    * chain of single IEEE double ops on exactly-reproducible inputs, so
    * codes AND the error report are bit-identical across engines —
    * quantization quality can be gated by a plain SQL oracle. At 100 TB
    * this is the shape that matters: fit is a dim-bounded aggregation,
    * encode touches each vector once with zero shuffle, and the codes
    * column is what [[annIvfPq]]-style ADC scans page through.
    */
  /** Signed random projection (Johnson–Lindenstrauss / Achlioptas ±1):
    * project `dim`-d embeddings to `k` output dims via a deterministic
    * ±1 matrix derived from md5 — `sign(k,i) = −1 iff the first hex
    * digit of md5("k:i") ≥ 8` — scaled by 1/√k. The cheap dimension
    * reduction run before ANN indexing or pairwise scans when the
    * input dimensionality, not the row count, is the cost driver;
    * cosine/L2 structure is preserved in expectation (JL lemma).
    *
    * Determinism/scale: the matrix is CONTENT-derived (no RNG state),
    * built once from a `k·dim`-row range cross — broadcast to
    * executors as one row of per-k sign arrays — and each projection
    * is a map-side left-to-right `aggregate` fold, so outputs are
    * bit-identical across engines, runs, and partitionings, and the
    * corpus is never shuffled.
    */
  def srpProject(vectors: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = vectors.sparkSession
    val m = s.range(k.toLong).select(col("id").as("k"))
      .crossJoin(s.range(dim.toLong).select(col("id").as("i")))
      .select(col("k"), col("i"),
        when(substring(md5(concat(col("k").cast("string"), lit(":"),
          col("i").cast("string"))), 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
          lit(-1.0)).otherwise(lit(1.0)).as("sgn"))
    val byK = m.groupBy("k")
      .agg(expr("transform(array_sort(collect_list(struct(i, sgn))), x -> x.sgn)").as("sg"))
      .groupBy()
      .agg(expr("array_sort(collect_list(struct(k, sg)))").as("ks"))
    vectors
      .withColumn("e", expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))"))
      .crossJoin(broadcast(byK))
      .select(col(idCol), col("e"), explode(col("ks")).as("row"))
      .select(col(idCol), col("row.k").as("k"),
        (expr("aggregate(zip_with(e, row.sg, (x, s) -> x * s), 0D, (a, x) -> a + x)")
          / sqrt(lit(k.toDouble))).as("value"))
  }

  def int8Encode(vectors: DataFrame, stats: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val st = stats.groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(d, mn, rng))), " +
        "x -> struct(x.mn AS mn, x.rng AS rng))").as("st"))
    vectors
      .withColumn("e", expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))"))
      .crossJoin(broadcast(st))
      .withColumn("codes", expr(
        """zip_with(e, st, (x, s) -> CASE WHEN s.rng = 0D THEN 0
          | ELSE CAST(least(255D, floor((x - s.mn) / s.rng * 255D)) AS INT)
          | END)""".stripMargin))
      .withColumn("deq", expr(
        "zip_with(codes, st, (c, s) -> s.mn + (CAST(c AS DOUBLE) + 0.5D) * s.rng / 256D)"))
      .withColumn("mse", expr(
        "aggregate(zip_with(e, deq, (x, h) -> (x - h) * (x - h)), 0D, (a, x) -> a + x)" +
          " / size(e)"))
      .select(col(idCol), col("codes"), col("deq"), col("mse"))
  }
}
