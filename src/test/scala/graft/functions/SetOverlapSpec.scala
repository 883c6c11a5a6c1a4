package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SetOverlap (codegen distinct-intersection count) vs the built-in
  * `size(array_intersect)` it replaces — including duplicate elements on
  * either side (each distinct common element must count once), empty and
  * disjoint arrays, and randomized fixtures. Running through DataFrames
  * exercises the generated-code path; a constant-folded literal would
  * exercise interpreted eval only.
  */
class SetOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches size(array_intersect) on fixtures with duplicates") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "a", "a")), // dups both sides -> 1
      (Seq.empty[String], Seq("a")),
      (Seq("x"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "a", "c"), Seq("c", "a", "c")))
    val df = cases.toDF("a", "b")
      .withColumn("got", SetOverlap(spark, col("a"), col("b")))
      .withColumn("expected", size(array_intersect(col("a"), col("b"))).cast("long"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("matches size(array_intersect) on randomized shingle-like arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    val cases = Seq.fill(200) {
      def arr() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      (arr(), arr())
    }
    val df = cases.toDF("a", "b")
      .withColumn("got", SetOverlap(spark, col("a"), col("b")))
      .withColumn("expected", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("got") =!= col("expected")).isEmpty)
    assert(df.filter(col("got") > 0).count() > 0) // fixtures actually overlap
  }
}
