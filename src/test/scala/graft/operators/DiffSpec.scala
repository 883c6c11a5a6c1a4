package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff: every class assigned correctly, null-safe compare,
  * and the diff round-trips (old + diff = new).
  */
class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a", 10L), // unchanged
    (2L, "a", 5L),  // changed (5 -> 7)
    (3L, "b", 2L)   // removed
  ).toDF("k", "g", "v")
  private val newSnap = Seq(
    (1L, "a", 10L),
    (2L, "a", 7L),
    (4L, "b", 9L)   // added
  ).toDF("k", "g", "v")

  test("all four change classes and old/new values") {
    val got = Diff.snapshotDiff(oldSnap, newSnap, Seq("k", "g"), Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      (1L, "a", "unchanged", Some(10L), Some(10L)),
      (2L, "a", "changed", Some(5L), Some(7L)),
      (3L, "b", "removed", Some(2L), None),
      (4L, "b", "added", None, Some(9L))))
  }

  test("null compare values are null-safe (null == null is unchanged)") {
    val o = Seq((1L, Option.empty[Long]), (2L, Option(3L)))
      .toDF("k", "v")
    val n = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "v")
    val got = Diff.snapshotDiff(o, n, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diff round-trips: applying it to the old snapshot rebuilds the new") {
    import org.apache.spark.sql.functions._
    val diff = Diff.snapshotDiff(oldSnap, newSnap, Seq("k", "g"), Seq("v"))
    val rebuilt = diff.filter(col("change") =!= "removed")
      .select(col("k"), col("g"),
        coalesce(col("new_v"), col("old_v")).as("v"))
    assert(rebuilt.exceptAll(newSnap).isEmpty && newSnap.exceptAll(rebuilt).isEmpty)
  }
}
