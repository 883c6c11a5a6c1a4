package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree orientation — the
  * graph-shape metric behind community detection and near-dup cluster
  * quality (a dup cluster whose nodes close many triangles is a true
  * clique family; a star of coincidental matches closes none). Output
  * is the per-node triangle count, the local ingredient of the
  * clustering coefficient.
  *
  * Algorithm (the MapReduce "compact-forward" / Cohen orientation,
  * standard since Suri & Vassilvitskii's "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11): orient every undirected edge
  * from its lower endpoint to its higher endpoint under the total
  * order (degree, id). Every triangle then has exactly ONE source node
  * with two out-edges, so counting wedges at each source and checking
  * the closing edge counts each triangle exactly once, and the wedge
  * fanout at any node is bounded by its OUT-degree under orientation —
  * O(sqrt(m)) on any graph (arboricity bound), which is precisely what
  * kills the "last reducer" hot key a naive wedge join dies on at
  * 100 TB: a celebrity node of degree 10M generates 10M wedges, not
  * 10M².
  *
  * Plan shape: degree agg (one shuffle on node), two key joins to
  * attach endpoint degrees, a self-join on the wedge source, and a
  * semi-ish inner join on the closing edge — all hash joins on bounded
  * keys, no cross product, no driver state. AQE handles residual skew.
  */
object Triangles {

  /** Per-node triangle counts over an undirected edge list (duplicate
    * edges, reversed duplicates, and self-loops are cleaned first).
    * Output: `(node, n_tri)` for every node in at least one triangle,
    * ordered by node.
    */
  def perNodeTriangles(edges: DataFrame, u: String, v: String): DataFrame = {
    // canonical undirected edge set: (lo, hi), no self-loops, distinct
    val canon = edges
      .select(least(col(u), col(v)).as("lo"), greatest(col(u), col(v)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = canon.select(col("lo").as("node"))
      .union(canon.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src -> dst iff (deg(src), src) < (deg(dst), dst)
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "lo").withColumnRenamed("deg", "dlo"), "lo")
      .join(deg.withColumnRenamed("node", "hi").withColumnRenamed("deg", "dhi"), "hi")
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
        .otherwise(col("hi")).as("src"),
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
        .otherwise(col("lo")).as("dst"),
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")), col("dhi"))
        .otherwise(col("dlo")).as("ddst"))
    // wedges at each source: out-neighbor pairs ordered by (deg, id),
    // then close with the oriented edge (y, z)
    val e1 = oriented.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
    val e2 = oriented.select(col("src"), col("dst").as("z"), col("ddst").as("dz"))
    val wedges = e1.join(e2, "src")
      .filter(col("dy") < col("dz") || (col("dy") === col("dz") && col("y") < col("z")))
    val closing = oriented.select(col("src").as("y"), col("dst").as("z"))
    val tri = wedges.join(closing, Seq("y", "z"))
      .select(col("src").as("a"), col("y").as("b"), col("z").as("c"))
    tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy("node")
  }
}
