package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB shuffles. AQE's skew-join split
  * handles sort-merge joins at runtime; these cover the two cases it
  * doesn't: hot-key AGGREGATION (one reducer owns the hot key no matter
  * how the engine splits partitions) and broadcast-ineligible hash joins
  * with a hot probe key.
  */
object Skew {

  /** Algebraic aggregate spec for the two-phase salted plan. */
  sealed trait SaltedAgg { def col: String; def as: String }
  final case class SaltedSum(col: String, as: String) extends SaltedAgg
  final case class SaltedCount(as: String) extends SaltedAgg { val col = "*" }
  final case class SaltedMin(col: String, as: String) extends SaltedAgg
  final case class SaltedMax(col: String, as: String) extends SaltedAgg

  /** Two-phase aggregation: phase 1 groups by (keys, salt) — the hot key
    * fans out over `salts` reducers — phase 2 combines the partials per
    * key. Only algebraic aggregates (sum/count/min/max) are expressible;
    * that restriction is what makes the combine phase exact.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      aggs: Seq[SaltedAgg]): DataFrame = {
    require(salts > 0 && aggs.nonEmpty)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val phase1Aggs: Seq[Column] = aggs.map {
      case SaltedSum(c, as) => sum(col(c)).as(s"__p_$as")
      case SaltedCount(as) => count(lit(1)).as(s"__p_$as")
      case SaltedMin(c, as) => min(col(c)).as(s"__p_$as")
      case SaltedMax(c, as) => max(col(c)).as(s"__p_$as")
    }
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs: Seq[Column] = aggs.map {
      case SaltedSum(_, as) => sum(col(s"__p_$as")).as(as)
      case SaltedCount(as) => sum(col(s"__p_$as")).as(as)
      case SaltedMin(_, as) => min(col(s"__p_$as")).as(as)
      case SaltedMax(_, as) => max(col(s"__p_$as")).as(as)
    }
    partial.groupBy(keys.map(col): _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join for a skewed probe side: the big side gets a random
    * salt in [0, salts); the (broadcast-ineligible but replicable) build
    * side is exploded `salts`× so every (key, salt) bucket finds its
    * match. Exact for any join type where build-side rows may replicate
    * (inner / left-outer with unique build keys).
    */
  def saltedJoin(bigSkewed: DataFrame, buildSide: DataFrame, key: String,
                 salts: Int, joinType: String = "left"): DataFrame = {
    val saltedBig = bigSkewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val explodedBuild = buildSide.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedBuild, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
