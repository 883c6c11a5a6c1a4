package graft

import graft.queries.{CorpusQueries, EmbeddingQueries, EventQueries, IndexQueries, RelationalQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (operator coverage mapping lives beside each query):
  *  - q01–q15 relational   (SURVEY §2.1–§2.7)  → RelationalQueries
  *  - q16–q18, q40 events  (SURVEY §2.9 batch) → EventQueries
  *  - q19–q26, q35, q37–q38 text/dedup (§7.4)  → TextQueries
  *  - q27–q34, q36, q41 embeddings     (§7.4)  → EmbeddingQueries
  *  - q42–q48 corpus prep              (§7.4)  → CorpusQueries
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q02(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ EmbeddingQueries.queries ++
      CorpusQueries.queries ++ IndexQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q26 simhash, q29 ann — approximate / engine-hash-dependent), which
    * get the driver's weaker rows-only check and are pinned by ScalaTest.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ EmbeddingQueries.oracles ++
      CorpusQueries.oracles ++ IndexQueries.oracles
}
