package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** AsOfJoin property: for random event sets, the composed union+window
  * plan equals a per-row linear search for the latest right row with
  * ts <= left.ts in the same key.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("ts", LongType),
    StructField("id", LongType), StructField("v", DoubleType)))

  test("lastPrior equals linear-search semantics on random data") {
    val gen = for {
      nL <- Gen.chooseNum(1, 25)
      nR <- Gen.chooseNum(0, 25)
      lefts <- Gen.listOfN(nL, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L)))
      rights <- Gen.listOfN(nR, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L)))
    } yield (lefts, rights)
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    (1 to 25).foreach { _ =>
      gen.apply(params, seed).foreach { case (lefts0, rights0) =>
        // unique (k, ts) per side for deterministic expected values
        val lefts = lefts0.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        val rights = rights0.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i, t * 1.5) }
          .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        val leftDf = spark.createDataFrame(
          lefts.map(l => Row(l._1, l._2, l._3, 0.0)).asJava, schema)
        val rightDf = spark.createDataFrame(
          rights.map(r => Row(r._1, r._2, r._3, r._4)).asJava, schema)
          .withColumnRenamed("id", "rid").withColumnRenamed("v", "rv")
        val got = AsOfJoin.lastPrior(leftDf, rightDf, Seq("k"), "ts",
            valueCols = Seq("rv", "rid"))
          .collect().map(r => r.getLong(2) ->
            (Option(r.get(4)).map(_.asInstanceOf[Double]),
              Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
        lefts.foreach { case (k, t, id) =>
          val candidates = rights.filter(r => r._1 == k && r._2 <= t)
          val expect =
            if (candidates.isEmpty) (None, None)
            else {
              val best = candidates.maxBy(_._2)
              (Some(best._4), Some(best._3))
            }
          assert(got(id) == expect, s"key=$k ts=$t")
        }
      }
      seed = seed.next
    }
  }
}
