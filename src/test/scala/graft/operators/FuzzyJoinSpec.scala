package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for the blocking-based candidate generators beyond the
  * q107/q114/q118/q121 oracles: sorted-neighborhood window boundary
  * (exactly `window` apart is in; `window`+1 is out) across a block
  * edge, and containment vs Jaccard asymmetry on a subset pair.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sortedNeighborhood finds pairs exactly window apart, across blocks") {
    import spark.implicits._
    // sort order is aa < ab < ac < ad: ranks 1..4. window=2 pairs by
    // rank: (1,2),(1,3),(2,3),(2,4),(3,4) — (1,4) is 3 apart, out.
    // All names are pairwise dist<=2 so the distance filter keeps all.
    val df = Seq((1L, "aa"), (2L, "ab"), (3L, "ac"), (4L, "ad"))
      .toDF("id", "name")
    val got = FuzzyJoin.sortedNeighborhood(df, "id", "name", 2, 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("sortedNeighborhood emits each in-window pair exactly once") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, f"name$i%02d")).toDF("id", "name")
    val rows = FuzzyJoin.sortedNeighborhood(df, "id", "name", 3, 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("containment flags a subset pair that Jaccard misses") {
    import spark.implicits._
    val small = "one two three four five six"
    val big = small + " seven eight nine ten eleven twelve thirteen " +
      "fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    // containment of small in big = 1.0
    val cont = Dedup.containmentJoin(docs, "doc_id", "text", 3, 9, 10)
      .collect()
    assert(cont.length == 1 && cont.head.getDouble(5) == 1.0)
    // but Jaccard is small-set/union << 0.9
    val jac = Dedup.jaccardBrute(docs, "doc_id", "text", 3, 0.9).collect()
    assert(jac.isEmpty)
  }
}
