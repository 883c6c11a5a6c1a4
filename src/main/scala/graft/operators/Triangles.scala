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
  * Plan shape (r18, message-passing form): one distinct on the
  * canonical edge, then TWO node-keyed aggregations replace what was a
  * degree agg + two degree-attach joins + an adjacency agg + one
  * adjacency-attach join (guide §2.4 — fold joins into the
  * aggregations that already shuffle by the same key):
  *
  *  1. group the directed expansion by src — one pass yields BOTH
  *     deg(src) (the count) and src's neighbor list;
  *  2. explode that back as (dst, (src, deg(src))) messages and group
  *     by dst — the list size IS deg(dst), so each node now holds every
  *     neighbor WITH its degree and its own degree, and the
  *     degree-orientation filter runs per-node over that list with no
  *     join at all.
  *
  * Exploding the out-adjacency gives each oriented edge its src list
  * for free (it is co-partitioned by construction); only ONE join
  * remains — attaching the dst list — and its right side is already
  * partitioned by node, so at any scale exactly one side of one join
  * exchanges. The old form exchanged the edge set through two degree
  * joins and two adjacency joins whenever the degree/adjacency tables
  * outgrew the broadcast threshold — the 100 TB regime. The per-node
  * orientation filter is an interpreted HOF, but over degree-bounded
  * lists of trivial comparisons (Σdeg = 2m elements total); forcing it
  * into codegen would cost an extra explode + re-aggregation pass,
  * which is strictly more work. No driver-side count probe anywhere:
  * AQE still upgrades the one remaining join to broadcast when the
  * adjacency table fits.
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
    // message round 1: group the directed expansion by source — ONE
    // aggregation yields deg(node) AND node's full neighbor list
    val d = canon.select(col("lo").as("node"), col("hi").as("nbr"))
      .union(canon.select(col("hi").as("node"), col("lo").as("nbr")))
    val a1 = d.groupBy("node")
      .agg(count(lit(1)).as("deg"), collect_list(col("nbr")).as("nbrs"))
    // message round 2: each node sends (itself, its degree) to every
    // neighbor; the receiver's list size IS its own degree, so the
    // (deg, id) orientation — src -> dst iff (deg(src), src) <
    // (deg(dst), dst) — becomes a per-node list filter, joining nothing
    val msgs = a1.select(col("node"), col("deg"), explode(col("nbrs")).as("dst"))
    val adj = msgs.groupBy(col("dst"))
      .agg(collect_list(struct(col("deg").as("d"), col("node").as("n"))).as("infos"))
      .select(col("dst").as("node"), size(col("infos")).cast("long").as("deg"),
        col("infos"))
      .select(col("node"), transform(
        filter(col("infos"), si => si("d") > col("deg") ||
          (si("d") === col("deg") && si("n") > col("node"))),
        si => si("n")).as("out"))
    // exploding the out-adjacency yields every oriented edge WITH its
    // src list attached (out-degree bounded by O(sqrt(m)) — arboricity);
    // only the dst list needs a join, and its right side is already
    // partitioned by node. Edge iterator: for oriented (src, dst),
    // every w in adj(src) ∩ adj(dst) closes the triangle (src, dst, w),
    // found at exactly one edge (the one leaving its unique
    // two-out-edge node). INNER join: every node with an edge receives
    // at least one message, so all oriented edges survive; an empty lb
    // yields an empty intersection, dropped by the size filter anyway.
    val withLists = adj
      .select(col("node").as("src"), col("out").as("la"))
      .select(col("src"), col("la"), explode(col("la")).as("dst"))
      .join(adj.select(col("node").as("dst"), col("out").as("lb")), Seq("dst"))
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
