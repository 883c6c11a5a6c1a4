package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Diversity-based data selection: greedy k-center coreset (Gonzalez'
  * farthest-point traversal, 2-approximation to the k-center cover) —
  * pick the vector set that best SPREADS over the embedding space, the
  * complement of the quality/similarity selectors (q129 picks the best
  * scored, SemDeDup drops the redundant; this picks the most diverse,
  * e.g. seed sets for clustering, eval-slice selection, active-learning
  * batches).
  *
  * Deterministic and engine-replayable: seed = smallest vec_id; each
  * round selects the candidate with the LARGEST min-squared-distance to
  * the current set (ties broken by smaller vec_id); distances are
  * left-to-right double folds (VectorFns convention), so the DuckDB
  * oracle — the same k-step greedy unrolled as a WITH chain — matches
  * bit-for-bit, NULL distance for the seed row.
  *
  * Scale shape: k linear passes, each map-only (distances against ≤ k
  * BROADCAST constant centers, `least` over k codegen folds) into a
  * single-row `max(struct)` argmax — no shuffle of the vector table, no
  * pairwise join anywhere, driver state = k centers. O(n·k) total work,
  * the textbook distributed form of the algorithm.
  */
object Coreset {

  /** Squared L2 distance from an array<float> column to a constant
    * center, as a left-to-right double fold (oracle-replayable).
    */
  private def sqDistConst(a: Column, center: Array[Double]): Column =
    VectorFns.arraySum(zip_with(VectorFns.toDouble(a),
      typedLit(center), (x, y) => (x - y) * (x - y)))

  /** @return (sel_rank, vec_id, dist2) — dist2 = min squared distance to
    *         the previously-selected set at selection time (NULL for the
    *         seed).
    */
  def kCenter(vectors: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vectors.sparkSession
    val v = vectors.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))

    val seedRows = v.orderBy("vec_id").limit(1).collect()
    require(seedRows.nonEmpty, "kCenter on an empty vector table")
    var selected = Vector[(Long, Array[Double], Option[Double])](
      (seedRows.head.getLong(0),
        seedRows.head.getSeq[Float](1).map(_.toDouble).toArray, None))

    var exhausted = false
    while (selected.size < k && !exhausted) {
      val dist = selected.map { case (_, c, _) => sqDistConst(col("embedding"), c) }
        .reduce(least(_, _))
      val chosen = v
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .select(col("vec_id"), col("embedding"), dist.as("d"))
        .agg(max(struct(col("d"), negate(col("vec_id")).as("nid"),
          col("embedding").as("e"))).as("m"))
        .select(col("m.d"), col("m.nid"), col("m.e"))
        .collect().head
      // max over an empty relation (k > n): a null struct — stop with
      // the n centers that exist rather than NPE
      if (chosen.isNullAt(1)) exhausted = true
      else selected = selected :+ ((-chosen.getLong(1),
        chosen.getSeq[Float](2).map(_.toDouble).toArray,
        Some(chosen.getDouble(0))))
    }

    val schema = StructType(Seq(
      StructField("sel_rank", IntegerType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("dist2", DoubleType, nullable = true)))
    val rows = selected.zipWithIndex.map { case ((id, _, d), i) =>
      Row(i + 1, id, d.orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
