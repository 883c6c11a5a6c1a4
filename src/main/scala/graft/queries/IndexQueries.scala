package graft.queries

import graft.Tables
import graft.operators.{InvertedIndex, SuffixArray}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-structure operators over `documents`: the distributed suffix
  * array (exact any-length substring dedup, Lee et al. 2022), and the
  * retrieval-index lifecycle ops built on it. The corpus is ASCII
  * (TESTDATA.md), so JVM char order and DuckDB byte order agree and
  * every rank here is replayable in the oracle.
  */
object IndexQueries {

  /** q137 — the corpus suffix array itself: every (doc_id, position)
    * suffix with its 1-based rank in global suffix order (suffixes do
    * not cross documents; byte-equal suffixes tie-break (doc_id, p)).
    * Built by prefix doubling with two-pass distributed dense ranks —
    * no global window anywhere (see operators.SuffixArray). The oracle
    * sorts the materialized suffix strings directly — an O(n·len)
    * memory form only viable at oracle scale, which is the point: the
    * doubling build never materializes a suffix.
    */
  def q137(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    SuffixArray.build(docs)
      .select(col("sa_rank"), col("doc_id"), col("p").cast("long").as("p"))
      .orderBy("sa_rank")
  }

  val q137Sql: String =
    """WITH pos AS (
      | SELECT doc_id, i AS p, substr(text, i) AS suf
      | FROM documents, unnest(range(1, length(text) + 1)) AS t(i))
      |SELECT CAST(row_number() OVER (ORDER BY suf, doc_id, p) AS BIGINT) AS sa_rank,
      | doc_id, CAST(p AS BIGINT) AS p
      |FROM pos ORDER BY sa_rank""".stripMargin

  /** q138 — longest duplicated substrings: exact LCP of every
    * SA-adjacent suffix pair (the LCP array — max(lcp) is the longest
    * substring occurring twice anywhere in the corpus, the signal
    * q126 approximates at fixed L=40), top-10 with the duplicated
    * excerpt. LCPs come from the retained doubling levels (high→low
    * rank-equality walk, two equi-joins per level) — the text is
    * never re-compared or shipped. The oracle replays each LCP in two
    * stages — largest equal 32-char-block prefix, then the first
    * mismatch inside the next block — one set-oriented pass (a
    * char-by-char recursive-CTE walk is exact too, but pays one join
    * per character of the DEEPEST lcp: 114 s vs 2 s here, because the
    * corpus contains whole-document duplicates).
    */
  def q138(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sa = SuffixArray.build(docs)
    val top = SuffixArray.adjacentLcp(sa, docs)
      .orderBy(desc("lcp"), col("doc_a"), col("p_a"), col("doc_b"), col("p_b"))
      .limit(10)
    top.join(docs.select(col("doc_id").as("doc_a"), col("text")), Seq("doc_a"))
      .select(col("lcp"), col("doc_a"), col("p_a"), col("doc_b"), col("p_b"),
        expr("substring(text, cast(p_a AS int), cast(least(lcp, 60) AS int))")
          .as("excerpt"))
      .orderBy(desc("lcp"), col("doc_a"), col("p_a"), col("doc_b"), col("p_b"))
  }

  val q138Sql: String =
    """WITH pos AS (
      | SELECT doc_id, i AS p, substr(text, i) AS suf
      | FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
      |sa AS (
      | SELECT doc_id, p, suf, row_number() OVER (ORDER BY suf, doc_id, p) AS r
      | FROM pos),
      |pr AS (
      | SELECT a.r AS r, a.doc_id AS doc_a, a.p AS p_a, a.suf AS suf_a,
      |        b.doc_id AS doc_b, b.p AS p_b, b.suf AS suf_b
      | FROM sa a JOIN sa b ON b.r = a.r + 1),
      |coarse AS (
      | SELECT r, max(m) AS c
      | FROM pr, unnest(range(1, CAST((SELECT max(length(text)) FROM documents) / 32 AS BIGINT) + 2)) AS t(m)
      | WHERE m * 32 <= least(length(suf_a), length(suf_b))
      |   AND substr(suf_a, 1, CAST(m * 32 AS INT)) = substr(suf_b, 1, CAST(m * 32 AS INT))
      | GROUP BY r),
      |fine AS (
      | SELECT p.r, coalesce(c.c, 0) AS c, min(j) AS mism
      | FROM pr p LEFT JOIN coarse c USING (r), unnest(range(1, 34)) AS t(j)
      | WHERE coalesce(c.c, 0) * 32 + j > least(length(p.suf_a), length(p.suf_b))
      |    OR substr(p.suf_a, CAST(coalesce(c.c, 0) * 32 + j AS INT), 1)
      |       <> substr(p.suf_b, CAST(coalesce(c.c, 0) * 32 + j AS INT), 1)
      | GROUP BY p.r, c.c),
      |lcp AS (SELECT r, CAST(c * 32 + mism - 1 AS BIGINT) AS lcp FROM fine)
      |SELECT l.lcp, p.doc_a, CAST(p.p_a AS BIGINT) AS p_a, p.doc_b,
      | CAST(p.p_b AS BIGINT) AS p_b,
      | substr(d.text, CAST(p.p_a AS INT), CAST(least(l.lcp, 60) AS INT)) AS excerpt
      |FROM lcp l JOIN pr p USING (r) JOIN documents d ON d.doc_id = p.doc_a
      |ORDER BY l.lcp DESC, p.doc_a, p.p_a, p.doc_b, p.p_b LIMIT 10""".stripMargin

  /** q139 — positional-index phrase search: find every occurrence of
    * the corpus's most frequent word trigram (ties to the
    * lexicographically smallest — a deterministic in-query choice, no
    * hardcoded phrase) via the inverted-index lifecycle: build
    * postings, then intersect the three words' position lists
    * rarest-first on (doc, start). The oracle replays the semantics
    * directly as a trigram scan; InvertedIndexSpec pins that a SAVED
    * index answers identically with directory-level pruning.
    */
  def q139(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // most frequent trigram, map-side formation (q70's pattern; split
    // once into a column — a re-split inside the lambda is O(len²))
    // the size(ws) >= 3 guard mirrors the oracle's empty range for 1-2
    // word docs (sequence(1, size-2) is DESCENDING below 3 words and
    // element_at(ws, 0) would throw); headOption handles a corpus with
    // no trigram at all — the oracle returns zero rows there
    val top = docs.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
          |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("g")).limit(1)
      .head(1).headOption.map(_.getString(0))
    top match {
      case None =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          new org.apache.spark.sql.types.StructType()
            .add("doc_id", org.apache.spark.sql.types.LongType)
            .add("n_matches", org.apache.spark.sql.types.LongType)
            .add("first_start", org.apache.spark.sql.types.LongType))
      case Some(g) =>
        val idx = InvertedIndex.buildIndex(docs)
        InvertedIndex.phraseSearch(idx, g.split(' ').toSeq)
          .orderBy("doc_id")
    }
  }

  val q139Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (
      | SELECT doc_id, i AS p, array_to_string(list_slice(w, i, i + 2), ' ') AS g
      | FROM w, unnest(range(1, len(w) - 1)) AS t(i)),
      |top AS (SELECT g FROM g GROUP BY g ORDER BY count(*) DESC, g LIMIT 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
      | CAST(min(p) AS BIGINT) AS first_start
      |FROM g JOIN top USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q140 — weighted all-pairs near-dup: every doc pair with tf-idf
    * trigram cosine ≥ 0.6 via Bayardo prefix filtering (the weighted
    * complement of q24's set-Jaccard prefix join; operators.Apss).
    * θ=0.6 sits in this corpus's separation gap (near-dup pairs score
    * ≥ 0.8, unrelated pairs < 0.2). The oracle is the brute
    * token-join form — quadratic in shared-token pairs, oracle-scale
    * only — with the identical rational-idf / sorted-fold arithmetic.
    */
  def q140(s: SparkSession, dir: String): DataFrame =
    graft.operators.Apss
      .tfidfCosineSelfJoin(Tables.documents(s, dir), 0.6)
      .orderBy("doc_a", "doc_b")

  val q140Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g0 AS (
      | SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS g
      | FROM w, unnest(range(1, len(w) - 1)) AS t(i)),
      |tf AS (SELECT doc_id, g, CAST(count(*) AS DOUBLE) AS tf FROM g0 GROUP BY 1, 2),
      |df AS (SELECT g, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |wt AS (SELECT doc_id, g, tf * (n / df) AS w FROM tf JOIN df USING (g) CROSS JOIN n),
      |nrm AS (
      | SELECT doc_id,
      |  sqrt(list_sum(list_transform(list(w ORDER BY g), x -> x * x))) AS nrm
      | FROM wt GROUP BY doc_id),
      |u AS (SELECT doc_id, g, w / nrm AS u FROM wt JOIN nrm USING (doc_id)),
      |pr AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.u * b.u AS prod
      | FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id),
      |cosv AS (
      | SELECT doc_a, doc_b, list_sum(list(prod ORDER BY prod)) AS cos
      | FROM pr GROUP BY 1, 2)
      |SELECT doc_a, doc_b, round(cos, 4) AS cos
      |FROM cosv WHERE cos >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_suffix_array" -> (q137 _),
    "q138_longest_dup_substring" -> (q138 _),
    "q139_phrase_search" -> (q139 _),
    "q140_tfidf_neardup" -> (q140 _))

  val oracles: Map[String, String] = Map(
    "q137_suffix_array" -> q137Sql,
    "q138_longest_dup_substring" -> q138Sql,
    "q139_phrase_search" -> q139Sql,
    "q140_tfidf_neardup" -> q140Sql)
}
