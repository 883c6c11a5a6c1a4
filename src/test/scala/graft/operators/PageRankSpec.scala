package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** PageRank structural invariants on hand-checkable graphs, plus the
  * cross-engine determinism property q88's oracle depends on (every
  * iteration rounded in-engine ⇒ two runs are bit-identical regardless
  * of partitioning).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ranks(edges: Seq[(Long, Long)], iterations: Int = 10): Map[Long, Double] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), iterations)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("undirected star: center outranks leaves, leaves tie, mass conserved") {
    val star = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L)
    val undirected = star ++ star.map(_.swap)
    val r = ranks(undirected)
    assert(r.size == 4)
    assert(r(0L) > r(1L))
    assert(r(1L) == r(2L) && r(2L) == r(3L))
    // Every node has out-degree >= 1 (undirected), so no rank mass leaks;
    // per-iteration 1e-12 rounding bounds the drift from exactly 1.
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("directed chain: a source node holds exactly the teleport share") {
    // a -> b -> c -> a would be a cycle; break it: a -> b -> c (c dangles
    // out of the node set's edges only as a receiver... c has no out-edge
    // is not allowed in the undirected contract, so close the loop c -> a
    // and check the no-IN-edge behavior with an extra source d -> a.
    val r = ranks(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L))
    // node 4 has no in-edges: rank = teleport = (1 - 0.85) / 4 each round
    assert(math.abs(r(4L) - 0.15 / 4) < 1e-12)
    // node 1 has two in-edges (from 3 and 4) -> strictly the largest
    assert(r(1L) == r.values.max)
  }

  test("deterministic across runs and partitionings") {
    import spark.implicits._
    val edges = (1L to 200L).flatMap { i =>
      val j = i * 7919 % 200 + 1
      Seq(i -> j, j -> i)
    }
    val a = PageRank.run(edges.toDF("src", "dst"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(edges.toDF("src", "dst").repartition(13), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b) // bit-identical doubles, not approximate
  }

  test("driver fast path and distributed path agree bit-for-bit") {
    import spark.implicits._
    val edges = (1L to 300L).flatMap { i =>
      val j = i * 6151 % 300 + 1
      Seq(i -> j, j -> i)
    }.toDF("src", "dst")
    val driver = PageRank.run(edges, 10) // default threshold -> in-driver
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = PageRank.run(edges, 10, driverMaxEdges = 0) // force Pregel
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(driver == dist) // per-iteration rounding makes paths identical
  }
}
