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
