package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond dedup/similarity (SURVEY §7.4 extension inventory):
  * reproducible sampling + split assignment, corpus-shape statistics,
  * repetition diagnostics, and vocabulary construction. Like TextQueries,
  * every computation is deliberately SQL-expressible so the DuckDB oracle
  * replays it exactly.
  */
object CorpusQueries {

  /** Deterministic content-keyed hash bucket in [0, 256): the first two
    * hex chars of md5(key || salt), compared as lowercase hex strings —
    * identical in Spark and DuckDB, so sampling decisions are
    * reproducible across engines, runs, AND cluster sizes (no RNG, no
    * partition dependence — the property that matters when a 100 TB
    * corpus is resampled incrementally).
    */
  private def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 2)

  /** q42 — stratified reproducible sampling + train/val/test split
    * assignment: per-stratum keep rates (en 16/256, other langs 32/256)
    * via one hash, split via an independent hash (salts differ, so the
    * two decisions are uncorrelated). Entirely map-side at scale — no
    * shuffle before the oracle-determinism sort; rerunning on a grown
    * corpus never reassigns an existing doc.
    */
  def q42(s: SparkSession, dir: String): DataFrame = {
    val keep = hashBucket(col("doc_id"), ":sample")
    val split = hashBucket(col("doc_id"), ":split")
    Tables.documents(s, dir)
      .filter(keep < when(col("lang") === "en", lit("10")).otherwise(lit("20")))
      .select(col("doc_id"), col("lang"),
        when(split < "0a", lit("test"))
          .when(split < "14", lit("val"))
          .otherwise(lit("train")).as("split"))
      .orderBy("doc_id")
  }

  val q42Sql: String =
    """SELECT doc_id, lang,
      | CASE WHEN substr(md5(doc_id::VARCHAR || ':split'), 1, 2) < '0a' THEN 'test'
      |      WHEN substr(md5(doc_id::VARCHAR || ':split'), 1, 2) < '14' THEN 'val'
      |      ELSE 'train' END AS split
      |FROM documents
      |WHERE substr(md5(doc_id::VARCHAR || ':sample'), 1, 2)
      |      < CASE WHEN lang = 'en' THEN '10' ELSE '20' END
      |ORDER BY doc_id""".stripMargin

  /** q43 — corpus shape statistics per language: exact discrete
    * percentiles (ANSI `percentile_disc`) of document length and token
    * count. Discrete (not interpolated) so every statistic is an actual
    * corpus value and integer-exact across engines. One shuffle on lang;
    * partial aggregation keeps the per-partition state at one
    * sorted-run per (lang, metric).
    */
  def q43(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), length(col("text")).cast("long").as("len"),
        size(TextFns.tokens(col("text"))).cast("long").as("ntok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY len)")
          .cast("long").as("p25_len"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY len)")
          .cast("long").as("p50_len"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY len)")
          .cast("long").as("p75_len"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY len)")
          .cast("long").as("p99_len"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ntok)")
          .cast("long").as("p50_tokens"))
      .orderBy("lang")

  val q43Sql: String =
    """WITH t AS (
      | SELECT lang, length(text) AS len,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS ntok
      | FROM documents)
      |SELECT lang, COUNT(*) AS n,
      | CAST(quantile_disc(len, 0.25) AS BIGINT) AS p25_len,
      | CAST(quantile_disc(len, 0.5) AS BIGINT) AS p50_len,
      | CAST(quantile_disc(len, 0.75) AS BIGINT) AS p75_len,
      | CAST(quantile_disc(len, 0.99) AS BIGINT) AS p99_len,
      | CAST(quantile_disc(ntok, 0.5) AS BIGINT) AS p50_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** q44 — repetition diagnostics per document (the Gopher-style "mostly
    * repeated content" signal): token count, distinct-token count, and
    * the highest single-token frequency. The max-frequency path is
    * explode → two keyed aggregations — both keyed by doc_id, so at
    * scale it is one shuffle of (doc_id, token) pairs with map-side
    * partial counts, then a doc-keyed rollup.
    */
  def q44(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
    val maxFreq = toks.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("f"))
      .groupBy("doc_id").agg(max("f").as("max_token_freq"))
    toks.select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_tokens"))
      .join(maxFreq, "doc_id")
      .orderBy("doc_id")
  }

  val q44Sql: String =
    """WITH w AS (
      | SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      | FROM documents),
      |f AS (
      | SELECT doc_id, tok, COUNT(*) AS f
      | FROM (SELECT doc_id, unnest(w) AS tok FROM w) GROUP BY doc_id, tok),
      |m AS (SELECT doc_id, MAX(f) AS max_token_freq FROM f GROUP BY doc_id)
      |SELECT w.doc_id, len(w.w) AS n_tokens,
      | len(list_distinct(w.w)) AS n_distinct_tokens, m.max_token_freq
      |FROM w JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q45 — vocabulary construction: top-50 terms by document frequency
    * (ties broken by term, a total order ⇒ deterministic LIMIT). The
    * per-doc `array_distinct` bounds each doc's contribution to its
    * distinct terms; the groupBy partial-aggregates map-side so only
    * (term, partial df) pairs shuffle, and the top-k is
    * TakeOrderedAndProject — no global sort.
    */
  def q45(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(array_distinct(TextFns.tokens(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("term")).limit(50)

  val q45Sql: String =
    """SELECT term, COUNT(*) AS df
      |FROM (SELECT doc_id, unnest(list_distinct(
      |        string_split_regex(lower(trim(text)), '\s+'))) AS term
      |      FROM documents)
      |GROUP BY term ORDER BY df DESC, term LIMIT 50""".stripMargin

  /** q46 — leakage-safe (group-aware) split assignment: the split hash is
    * keyed on the near-dup CLUSTER id (q38's transitive components), not
    * the doc id, so near-duplicate documents always land in the same
    * split — the standard guard against train/test contamination through
    * paraphrase-level duplicates. Singleton docs have cluster_id ==
    * doc_id and therefore get exactly the split q42 would assign them
    * (same salt). Composition of two verified operators; the extra cost
    * over q42 is the dedup-cluster pass itself.
    */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val split = hashBucket(col("cluster_id"), ":split")
    graft.operators.Dedup.dedupClusters(
        Tables.documents(s, dir), "doc_id", "text", 3, 0.7)
      .select(col("doc_id"), col("cluster_id"),
        when(split < "0a", lit("test"))
          .when(split < "14", lit("val"))
          .otherwise(lit("train")).as("split"))
      .orderBy("doc_id")
  }

  val q46Sql: String =
    """WITH RECURSIVE t AS (
      | SELECT doc_id,
      |  CASE WHEN len(w) >= 3
      |       THEN list_distinct(list_transform(range(1, len(w) - 1),
      |              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |       ELSE [array_to_string(w, ' ')] END AS sh
      | FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents)),
      |p AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM t a, t b
      | WHERE a.doc_id < b.doc_id
      |   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7),
      |e AS (
      | SELECT doc_a AS a, doc_b AS b FROM p
      | UNION SELECT doc_b, doc_a FROM p
      | UNION SELECT doc_id, doc_id FROM documents),
      |reach(a, b) AS (
      | SELECT a, b FROM e
      | UNION
      | SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      |c AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
      |SELECT doc_id, cluster_id,
      | CASE WHEN substr(md5(cluster_id::VARCHAR || ':split'), 1, 2) < '0a' THEN 'test'
      |      WHEN substr(md5(cluster_id::VARCHAR || ':split'), 1, 2) < '14' THEN 'val'
      |      ELSE 'train' END AS split
      |FROM c ORDER BY doc_id""".stripMargin

  /** q47 — benchmark decontamination: flag training documents sharing any
    * 5-gram with the held-out evaluation set (source = 'src0' stands in
    * for the benchmark corpus), reporting how many distinct grams
    * collide — the n-gram overlap check run before LLM training to keep
    * eval data out of the training set. Scale shape: the benchmark gram
    * set is small (eval sets are) → broadcast hash join, so training
    * grams are filtered map-side and only colliding (doc, gram) pairs
    * reach the count-distinct shuffle.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val gramUdf = udf { text: String =>
      graft.functions.Hashing.shingleSet(text, 5)
    }
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(gramUdf(col("text"))).as("gram"))
    val benchGrams = grams.filter(col("source") === "src0")
      .select("gram").distinct()
    grams.filter(col("source") =!= "src0")
      .join(broadcast(benchGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  val q47Sql: String =
    """WITH g AS (
      | SELECT doc_id, source, unnest(CASE WHEN len(w) >= 5
      |   THEN list_distinct(list_transform(range(1, len(w) - 3),
      |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
      |   ELSE [array_to_string(w, ' ')] END) AS gram
      | FROM (SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS w
      |       FROM documents)),
      |b AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
      |SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared_grams
      |FROM g JOIN b USING (gram) WHERE g.source <> 'src0'
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  /** q48 — concat-and-chunk packing offsets: LLM pretraining concatenates
    * the corpus in a fixed order and cuts fixed-size context windows, so
    * every document needs its GLOBAL token offset — an exact prefix sum
    * in doc_id order. A bare `Window.orderBy` would plan a single-task
    * sort; [[graft.operators.PrefixSum]] runs the two-pass parallel scan
    * (range partition → per-partition totals → broadcast bases) instead.
    * Output: per doc, its token span and the first/last 2048-token chunk
    * it lands in (documents may straddle a boundary — that is the
    * standard packing semantics).
    */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val chunk = 2048
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    graft.operators.PrefixSum
      .withRunningTotal(toks, "doc_id", "n_tokens", "cum")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_offset"),
        floor((col("cum") - col("n_tokens")) / chunk).cast("long").as("first_chunk"),
        floor((col("cum") - 1) / chunk).cast("long").as("last_chunk"))
      .orderBy("doc_id")
  }

  val q48Sql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
      | FROM documents),
      |c AS (
      | SELECT doc_id, n_tokens,
      |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      | FROM t)
      |SELECT doc_id, n_tokens,
      | CAST(cum - n_tokens AS BIGINT) AS start_offset,
      | CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS first_chunk,
      | CAST(floor((cum - 1) / 2048) AS BIGINT) AS last_chunk
      |FROM c ORDER BY doc_id""".stripMargin

  /** q49 — data-mixing weights: per-source document/token counts, each
    * source's token share, and the per-source sampling weight that would
    * equalize token contributions (uniform mixing target) — the numbers a
    * pretraining pipeline computes before weighted interleaving. One
    * keyed aggregation (partial map-side) + a broadcast of the one-row
    * grand total; ratios are IEEE double divisions of exact longs, so
    * the oracle matches bit-for-bit.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(s, dir)
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val grand = perSource.agg(
      sum("n_tokens").as("total"), count(lit(1)).as("k"))
    perSource.crossJoin(broadcast(grand))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total").cast("double"))
          .as("token_share"),
        (col("total").cast("double") /
          (col("k") * col("n_tokens").cast("double"))).as("weight"))
      .orderBy("source")
  }

  val q49Sql: String =
    """WITH t AS (
      | SELECT source,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS nt
      | FROM documents),
      |a AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
      |      FROM t GROUP BY source),
      |g AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM a)
      |SELECT source, n_docs, n_tokens,
      | CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
      | CAST(total AS DOUBLE) / (k * CAST(n_tokens AS DOUBLE)) AS weight
      |FROM a, g ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_stratified_sample" -> (q42 _),
    "q43_corpus_stats" -> (q43 _),
    "q44_repetition_stats" -> (q44 _),
    "q45_vocab_df" -> (q45 _),
    "q46_leakage_safe_split" -> (q46 _),
    "q47_decontaminate" -> (q47 _),
    "q48_pack_offsets" -> (q48 _),
    "q49_mixing_weights" -> (q49 _))

  val oracles: Map[String, String] = Map(
    "q42_stratified_sample" -> q42Sql,
    "q43_corpus_stats" -> q43Sql,
    "q44_repetition_stats" -> q44Sql,
    "q45_vocab_df" -> q45Sql,
    "q46_leakage_safe_split" -> q46Sql,
    "q47_decontaminate" -> q47Sql,
    "q48_pack_offsets" -> q48Sql,
    "q49_mixing_weights" -> q49Sql)
}
