package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for the state-merge and fuzzy-join operators that the
  * DuckDB oracles (q106/q107) exercise only on well-populated keys.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IncrementalAgg.merge handles one-sided keys and all merge kinds") {
    import spark.implicits._
    val base = Seq((1L, 2L, 10L, 5L), (2L, 1L, 7L, 7L))
      .toDF("k", "cnt", "mx", "mn")
    val delta = Seq((1L, 3L, 4L, 1L), (3L, 1L, 9L, 9L))
      .toDF("k", "cnt", "mx", "mn")
    val got = IncrementalAgg.merge(base, delta, Seq("k"),
      Seq(("cnt", "sum"), ("mx", "max"), ("mn", "min")))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 5L, 10L, 1L),  // both sides: sum, max, min
      (2L, 1L, 7L, 7L),   // base only: unchanged
      (3L, 1L, 9L, 9L)))  // delta only: adopted
  }

  test("FuzzyJoin.selfJoinDist1 finds exactly the distance-<=1 pairs") {
    import spark.implicits._
    // substitution (cat~car), deletion/insertion (cat~cats, cat~at),
    // exact duplicate (dog~dog), and a distance-2 pair (cat~carts NOT
    // matched even though they share deletion-key structure via cats/carts)
    val df = Seq((1L, "cat"), (2L, "car"), (3L, "cats"), (4L, "at"),
      (5L, "dog"), (6L, "dog"), (7L, "carts")).toDF("id", "s")
    val got = FuzzyJoin.selfJoinDist1(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (1L, 2L, 1L), // cat ~ car  (substitution)
      (1L, 3L, 1L), // cat ~ cats (insertion)
      (1L, 4L, 1L), // cat ~ at   (deletion)
      (3L, 7L, 1L), // cats ~ carts (insertion)
      (5L, 6L, 0L)) // dog ~ dog  (exact)
    assert(got == want) // note car ~ at (distance 2) is absent
    // brute-force replica over the same frame confirms completeness
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
  }

  test("FuzzyJoin.lookupDist(2) finds all dist-<=2 matches incl. transpositions") {
    import spark.implicits._
    val dict = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "mitten"), (5L, "ktiten"), (6L, "kit"), (7L, "bitter"))
      .toDF("id", "s")
    val q = Seq((100L, "kitten")).toDF("id", "s")
    val got = FuzzyJoin.lookupDist(q, "id", "s", dict, "id", "s", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // kitten: itself 0; sitten 1; mitten 1; sittin 2; ktiten (transpose) 2;
    // bitter (two substitutions) 2; kit (3 deletions) is out
    assert(got == Set((1L, 0L), (2L, 1L), (4L, 1L), (3L, 2L), (5L, 2L), (7L, 2L)))
    // variant count algebra: 1 + n + n(n-1)/2 distinct for distinct-char strings
    assert(FuzzyJoin.deletionVariants("abcde", 2).length == 1 + 5 + 10)
  }
}
