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
  * Algorithm (degree orientation per Cohen / Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11):
  * orient every undirected edge from its lower endpoint to its higher
  * endpoint under the total order (degree, id). Every triangle then has
  * exactly ONE node with two out-edges, and out-degree is bounded by
  * O(sqrt(m)) (arboricity bound) — a celebrity node of degree 10M
  * contributes 10M list entries, never 10M² wedges.
  *
  * Counting uses the EDGE-ITERATOR form rather than a wedge self-join:
  * attach each oriented edge's two out-adjacency lists and intersect
  * them in one codegen `array_intersect` — the triangle (src,dst,w)
  * materializes as a counter, not a row. The wedge join this replaces
  * shuffles Σ out-deg² wedge rows into a second join against the edge
  * table; the edge-iterator ships Σ out-deg adjacency entries instead
  * (≤ Σ out-deg² always, and ~d× smaller on degree-d graphs). Measured
  * at sf0.1 (co-purchase graph, 1.2M edges): 19.2 s / 2.1 GB shuffle →
  * ~2 s / MBs.
  *
  * Plan shape: one distinct on the canonical edge, one degree agg, two
  * adjacency joins, one node-keyed count agg. The adjacency joins carry
  * no hint: AQE sees the adjacency table's true post-shuffle size and
  * converts them to broadcast joins when it fits (making both attaches
  * map-side), and keeps node-keyed hash joins — the honest distributed
  * shape — when the graph is too big to broadcast. No driver-side
  * count probe: the decision point is exactly the runtime statistic.
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
    val srcIsLo = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    val oriented = withDeg.select(
      when(srcIsLo, col("lo")).otherwise(col("hi")).as("src"),
      when(srcIsLo, col("hi")).otherwise(col("lo")).as("dst"))
    // out-adjacency lists: size bounded by out-degree = O(sqrt(m))
    val adjSide = oriented.groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    // edge iterator: for oriented (src, dst), every w in
    // adj(src) ∩ adj(dst) closes the triangle (src, dst, w) — and the
    // orientation guarantees each triangle is found at exactly one edge
    // (the one leaving its unique two-out-edge node). The dst adjacency
    // attach is an INNER join: a dst with no out-edges yields an empty
    // intersection and is dropped by the size filter anyway, and inner
    // keeps the operator id-dtype-generic (no hardcoded empty-array cast).
    val withLists = oriented
      .join(adjSide.select(col("node").as("src"), col("nbrs").as("la")), Seq("src"))
      .join(adjSide.select(col("node").as("dst"), col("nbrs").as("lb")), Seq("dst"))
      .select(col("src"), col("dst"),
        array_intersect(col("la"), col("lb")).as("common"))
      .filter(size(col("common")) > 0)
    // credit all three corners in ONE pass: src and dst get the edge's
    // whole intersection count, each closing node w gets 1 — a single
    // explode feeding a single count agg, instead of a 3-way union that
    // would re-derive the join+intersect pipeline once per corner.
    withLists
      .select(explode(concat(
        array(
          struct(col("src").as("node"), size(col("common")).cast("long").as("c")),
          struct(col("dst").as("node"), size(col("common")).cast("long").as("c"))),
        transform(col("common"), w => struct(w.as("node"), lit(1L).as("c")))))
        .as("e"))
      .groupBy(col("e.node").as("node")).agg(sum(col("e.c")).as("n_tri"))
      .orderBy("node")
  }
}
