package graft

import graft.queries.{CorpusQueries, EmbeddingQueries, EventQueries, IndexQueries, MultimodalQueries, RelationalQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (operator coverage mapping lives beside each query;
  * the full op → gate table is QUERIES.md):
  *  - relational / SCD2 / as-of / CDC            → RelationalQueries
  *  - events, windows, sessionization, gap fill  → EventQueries
  *  - text analysis + dedup families             → TextQueries
  *  - embeddings, ANN/IVF lifecycle, k-means,
  *    label propagation, cluster topics          → EmbeddingQueries
  *  - corpus prep, sketches, BPE, mixing, packs  → CorpusQueries
  *  - suffix array / inverted index lifecycles   → IndexQueries
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q02(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ EmbeddingQueries.queries ++
      CorpusQueries.queries ++ IndexQueries.queries ++
      MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q26 simhash, q29 ann — approximate / engine-hash-dependent), which
    * get the driver's weaker rows-only check and are pinned by ScalaTest.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ EmbeddingQueries.oracles ++
      CorpusQueries.oracles ++ IndexQueries.oracles ++
      MultimodalQueries.oracles
}
