package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components — merge a delta edge batch into an
  * existing min-label clustering WITHOUT re-iterating the full graph:
  * the daily-crawl shape for near-dup cluster maintenance, where
  * re-clustering 100 TB for a 1% delta is the thing a production
  * pipeline must never do.
  *
  * Method: super-node contraction. Each existing cluster is one
  * super-node named by its label (which, by the [[Dedup
  * .connectedComponents]] contract, is the cluster's MINIMUM member
  * id). Delta edges map endpoint → old label (one delta-sized join
  * against the label table — the only contact with corpus-scale data),
  * giving a super-graph whose size is bounded by the delta's collision
  * neighborhood. Components of that super-graph (the same adaptive CC
  * — driver union-find under the threshold) yield an old-label →
  * new-label mapping, which broadcasts back over the label table.
  * Untouched clusters never shuffle, never iterate, never even join
  * (left join + coalesce).
  *
  * Exactness: contracting a cluster to its min-id representative
  * preserves reachability (every member reaches its label), and the
  * merged component's min over super-node names = min over all member
  * ids (each name IS its cluster's min; new nodes enter named by
  * themselves). So `merge(cc(E_old), D) ≡ cc(E_old ∪ D)` — pinned by
  * IncrementalCCSpec on crafted graphs and by q168's oracle, which IS
  * the full recompute.
  */
object IncrementalCC {

  /** @param oldLabels   (id, label) — the existing clustering; label =
    *                    min member id (connectedComponents' output)
    * @param deltaEdges  (src, dst) — new edges; endpoints may be known
    *                    ids or ids first seen in this delta
    * @param newVertices (id) — vertices first seen in the delta
    *                    (emitted as singletons if nothing links them)
    * @return (id, label) over old ∪ new vertices — identical to a full
    *         recompute over the union graph
    */
  def merge(oldLabels: DataFrame, deltaEdges: DataFrame,
            newVertices: DataFrame): DataFrame = {
    // endpoint → super-node name (old label, or the id itself for
    // first-seen nodes). Delta-sized; the big side is probed once.
    val ends = deltaEdges.select(col("src").as("id"))
      .unionByName(deltaEdges.select(col("dst").as("id")))
      .distinct()
    val endLabels = ends.join(oldLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("slabel"))
      .localCheckpoint()
    val superEdges = deltaEdges
      .join(endLabels.select(col("id").as("src"), col("slabel").as("sa")), Seq("src"))
      .join(endLabels.select(col("id").as("dst"), col("slabel").as("sb")), Seq("dst"))
      .select(col("sa").as("src"), col("sb").as("dst"))
      .filter(col("src") =!= col("dst"))
    val superVerts = superEdges.select(col("src").as("id"))
      .unionByName(superEdges.select(col("dst").as("id")))
      .distinct()
    // adaptive CC on the contracted graph — delta-neighborhood-sized
    val superMap = Dedup.connectedComponents(superEdges, superVerts)
      .filter(col("id") =!= col("label")) // identity rows carry no info
      .select(col("id").as("__olabel"), col("label").as("__nlabel"))
    val allLabels = oldLabels
      .unionByName(newVertices
        .join(oldLabels.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label")))
    allLabels
      .join(broadcast(superMap), allLabels("label") === superMap("__olabel"), "left")
      .select(allLabels("id"),
        coalesce(col("__nlabel"), allLabels("label")).as("label"))
  }
}
