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
  def annIvf(corpus: DataFrame, queryId: Long, k: Int,
             nlist: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    def assigned(df: DataFrame, centroids: Array[(Int, Array[Float])]): DataFrame = {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignUdf = udf { v: Seq[Float] =>
        var best = -1; var bestCos = Double.MinValue
        bc.value.foreach { case (cid, c) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < c.length) {
            val x = v(i).toDouble; val y = c(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          val cos = dot / (math.sqrt(na) * math.sqrt(nb))
          if (cos > bestCos) { bestCos = cos; best = cid }
        }
        best
      }
      df.withColumn("cluster", assignUdf(col("embedding")))
    }

    def recompute(df: DataFrame): Array[(Int, Array[Float])] = {
      // ONE shuffle of (cluster, dim, value) triples; the nlist×dim mean
      // rows come straight to the driver and assemble positionally — no
      // second aggregation or per-cluster array sort.
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
    var tagged = assigned(corpus, centroids)
    (1 until iters).foreach { _ =>
      centroids = recompute(tagged)
      tagged = assigned(corpus, centroids)
    }

    val query = corpus.filter(col("vec_id") === queryId).head()
    val qv = query.getAs[Seq[Float]]("embedding").toArray
    val probeClusters = centroids.map { case (cid, c) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < c.length) {
        val x = qv(i).toDouble; val y = c(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      cid -> dot / (math.sqrt(na) * math.sqrt(nb))
    }.sortBy(-_._2).take(nProbe).map(_._1).toSet

    val qDf = corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    tagged.filter(col("cluster").isin(probeClusters.toSeq: _*))
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
}
