package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for the SCD2 builder beyond what the q108 oracle covers:
  * null-valued tracked attributes, multi-attribute change detection,
  * and the open current interval.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("buildType2 collapses runs, versions changes, leaves current open") {
    import spark.implicits._
    val log = Seq(
      // key 1: A,A,B,A -> 3 versions (run of A collapses)
      (1L, 1, 10L, "A"), (1L, 2, 11L, "A"), (1L, 3, 12L, "B"), (1L, 4, 13L, "A"),
      // key 2: single row -> one open version
      (2L, 1, 20L, "X"))
      .toDF("k", "t", "id", "status")
    val got = Scd.buildType2(log, Seq("k"), "t", Seq("id"), Seq("status"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "A", 1, Some(3), 1L),
      (1L, "B", 3, Some(4), 2L),
      (1L, "A", 4, None, 3L),
      (2L, "X", 1, None, 1L)))
  }

  test("null attrs are null-safe: null->null collapses, null->value versions") {
    import spark.implicits._
    val log = Seq(
      (1L, 1, Option.empty[String]), (1L, 2, Option.empty[String]),
      (1L, 3, Some("A")), (1L, 4, Option.empty[String]))
      .toDF("k", "t", "status")
    val got = Scd.buildType2(log, Seq("k"), "t", Nil, Seq("status"))
      .orderBy("version")
      .collect()
      .map(r => (Option(r.getString(1)), r.getLong(4)))
    assert(got.toSeq == Seq((None, 1L), (Some("A"), 2L), (None, 3L)))
  }

  test("a change in ANY of several tracked attrs opens a version") {
    import spark.implicits._
    val log = Seq(
      (1L, 1, "A", 10), (1L, 2, "A", 20), (1L, 3, "B", 20), (1L, 4, "B", 20))
      .toDF("k", "t", "s1", "s2")
    val got = Scd.buildType2(log, Seq("k"), "t", Nil, Seq("s1", "s2"))
      .orderBy("version")
      .collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(5)))
    assert(got.toSeq == Seq(("A", 10, 1L), ("A", 20, 2L), ("B", 20, 3L)))
  }
}
