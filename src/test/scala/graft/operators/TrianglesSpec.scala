package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for degree-oriented triangle counting: known small
  * graphs, input dirt (dups, reversals, self-loops), and a brute-force
  * cross-check on a random graph.
  */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("K4 gives every node 3 triangles; dirt is cleaned") {
    import spark.implicits._
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i != j) yield (i, j)
    // full directed K4 (both directions = reversed dups) + self-loop + dup
    val edges = (k4 ++ Seq((1L, 1L), (1L, 2L))).toDF("u", "v")
    val got = Triangles.perNodeTriangles(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a star closes no triangles; adding one edge closes exactly one") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    assert(Triangles.perNodeTriangles(star, "u", "v").count() == 0)
    val plus = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L))).toDF("u", "v")
    val got = Triangles.perNodeTriangles(plus, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("matches brute force on a deterministic random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val edgeSet = (for {
      i <- 0L until n; j <- (i + 1) until n if rnd.nextDouble() < 0.15
    } yield (i, j)).toSet
    val adj = edgeSet ++ edgeSet.map(_.swap)
    val brute = (0L until n).map { x =>
      x -> (for {
        (a, b) <- edgeSet.toSeq if a != x && b != x
        if adj.contains((x, a)) && adj.contains((x, b))
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    val got = Triangles.perNodeTriangles(edgeSet.toSeq.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == brute)
  }
}
