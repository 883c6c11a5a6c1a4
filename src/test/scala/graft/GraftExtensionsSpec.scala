package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point: a fresh session configured with
  * spark.sql.extensions=graft.GraftExtensions can call the native
  * functions from pure SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_cosine_similarity is available via spark.sql.extensions") {
    // getOrCreate would silently return the shared TestSpark session and
    // drop the extensions config — clear the active/default session and
    // build a fresh one over the same SparkContext, restoring after.
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = spark.sql(
        """SELECT graft_cosine_similarity(
          |  array(cast(1.0 as float), cast(0.0 as float)),
          |  array(cast(1.0 as float), cast(0.0 as float))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(got - 1.0) < 1e-12)
      val ortho = spark.sql(
        """SELECT graft_cosine_similarity(
          |  array(cast(1.0 as float), cast(0.0 as float)),
          |  array(cast(0.0 as float), cast(1.0 as float))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(ortho) < 1e-12)
      val ham = spark.sql(
        "SELECT graft_hamming_distance(cast(5 as bigint), cast(6 as bigint)) AS h")
        .head().getInt(0)
      assert(ham == 2) // 0b101 vs 0b110
      val overlap = spark.sql(
        "SELECT graft_set_overlap(array('a','b','c'), array('b','c','d')) AS o")
        .head().getLong(0)
      assert(overlap == 2L)
      // the aggregate surfaces resolve through the extension too
      val hh = spark.sql(
        """SELECT graft_heavy_hitters(x, 16) AS m
          |FROM VALUES ('a'), ('a'), ('b') AS t(x)""".stripMargin)
        .head().getMap[String, Long](0)
      assert(hh == Map("a" -> 2L, "b" -> 1L))
      val tk = spark.sql(
        """SELECT graft_top_k(x, 2) AS t
          |FROM VALUES (5), (1), (9), (3) AS t(x)""".stripMargin)
        .head().getSeq[Int](0)
      assert(tk == Seq(1, 3))
      // packed argmin: nearest of two centroids is index 1,
      // dist 0 → packed = 0*2 + 1
      val pk = spark.sql(
        """SELECT graft_centroid_packed_argmin(
          |  array(cast(3 as bigint), cast(4 as bigint)),
          |  array(array(cast(0 as bigint), cast(0 as bigint)),
          |        array(cast(3 as bigint), cast(4 as bigint)))) AS p""".stripMargin)
        .head().getLong(0)
      assert(pk == 1L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
