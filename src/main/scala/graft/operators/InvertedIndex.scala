package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index lifecycle — build / save / load / phrase
  * search — the retrieval-index complement of the IVF ANN lifecycle
  * (Similarity.buildIvfIndex): train/build once, persist in a
  * prunable layout, then answer queries touching only the index slices
  * the query needs.
  *
  * Layout: one posting row per (token, doc) carrying the SORTED
  * 1-based word positions and tf. Rows are bucketed by
  * `pmod(xxhash64(token), numBuckets)` and the save partitions the
  * parquet by that bucket, so a phrase lookup prunes to |phrase|
  * directories at the FILE level (the same partition-pruning story as
  * the IVF inverted lists).
  *
  * Phrase search is the classic positional-postings intersection: word
  * i of the phrase contributes candidate starts `position − i`, and
  * the intersection is a chain of hash equi-joins on (doc, start) —
  * joined RAREST-FIRST (ascending corpus frequency, the standard
  * conjunctive-query optimization) so every intermediate is no larger
  * than the rarest word's posting set. Overlapping matches count;
  * repeated phrase words work because each offset probes the same
  * posting list independently.
  *
  * Scale: build is ONE map-side-combined shuffle keyed (token, doc);
  * hot tokens are aggregation keys, never window partitions. Search
  * shuffles only the phrase words' postings (after bucket+token
  * pushdown), bounded by the rarest word's df after the first join.
  */
object InvertedIndex {

  /** (doc, pos, tok): 1-based word positions, map-side explode. */
  def tokens(docs: DataFrame, docIdCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(col(docIdCol),
        posexplode(split(col(textCol), " ")).as(Seq("i", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col(docIdCol), (col("i") + 1).cast("long").as("pos"), col("tok"))

  /** Postings: (bucket, tok, doc, positions array<long> sorted, tf). */
  def buildPostings(docs: DataFrame, docIdCol: String = "doc_id",
                    textCol: String = "text", numBuckets: Int = 16): DataFrame =
    tokens(docs, docIdCol, textCol)
      .groupBy(col("tok"), col(docIdCol))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(numBuckets)))

  /** Persist partitioned by bucket: `path/bucket=N/…` directories. */
  def savePostings(postings: DataFrame, path: String): Unit =
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)

  def loadPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Docs containing the exact word sequence `phrase`:
    * (doc, n_matches, first_start). The bucket filter travels with the
    * token filter so a LOADED index prunes at the directory level.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String],
                   docIdCol: String = "doc_id",
                   numBuckets: Int = 16): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    // ONE pruned read of the phrase words' postings, materialized: the
    // bucket predicates are FOLDABLE expressions (constant-folded at
    // plan time), so a loaded index lists only |phrase| bucket
    // directories, and every later step — frequency ordering and the
    // join chain — runs off this bounded slice, never re-deriving or
    // re-scanning the index
    val bucketPreds = phrase.distinct
      .map(w => col("bucket") === pmod(xxhash64(lit(w)), lit(numBuckets)))
      .reduce(_ || _)
    val needed = postings
      .filter(bucketPreds && col("tok").isin(phrase.distinct: _*))
      .localCheckpoint()
    def starts(w: String, i: Int): DataFrame =
      needed.filter(col("tok") === w)
        .select(col(docIdCol), explode(col("positions")).as("pos"))
        .select(col(docIdCol), (col("pos") - i.toLong).as("start"))
    // rarest-first: total occurrences per distinct phrase word — a
    // |phrase|-row collect, the adaptive-plan-choice pattern
    val freqRows = needed.groupBy("tok").agg(sum(col("tf")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ordered = phrase.zipWithIndex.sortBy { case (w, _) =>
      (freqRows.getOrElse(w, 0L), w)
    }
    val first = starts(ordered.head._1, ordered.head._2)
    val matches = ordered.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(starts(w, i), Seq(docIdCol, "start"))
    }
    // valid starts are ≥ 1 (a later word near the doc head can produce
    // start ≤ 0 candidates; they can never complete, but filter anyway)
    matches.filter(col("start") >= 1L)
      .groupBy(col(docIdCol))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_start"))
  }
}
