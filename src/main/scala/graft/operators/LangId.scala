package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Character-n-gram Naive Bayes language identification — the r12
  * verdict's langid upgrade (the q22 stopword-marker heuristic is the
  * weakest text-analysis member; a real pipeline hits language ID on
  * every document, cf. CLD/langid.py's char-n-gram NB formulation,
  * Cavnar & Trenkle 1994 for the n-gram profile idea).
  *
  * Everything is RELATIONAL and closed-form — training is two
  * aggregations, scoring one gram-keyed join — so the full train +
  * predict pipeline SQL-replays in DuckDB and q173's oracle is exact,
  * not a golden. Numeric discipline: every log-probability is rounded
  * to 6 decimals and cast DECIMAL(18,6) BEFORE summation, so per-doc
  * scores are exact decimal sums — order-invariant across engines and
  * partitionings (the repo's decimal-sum rule for float aggregates).
  *
  * Model shape at 100 TB: the model is (|langs| × |distinct grams|)
  * rows — bounded by the alphabet, not the corpus (a few thousand rows
  * for any natural-language mix) — so it broadcasts, scoring is one
  * map-side join + a (doc, lang)-keyed partial aggregation, and
  * training's gram-count shuffle is map-side combined into the same
  * bounded key space. No per-doc state, no driver loop.
  */
object LangId {

  /** Per-document NB prediction: train add-one-smoothed char-n-gram
    * profiles on the rows where `trainPred` holds, score EVERY row
    * against every language, argmax with a deterministic (max score,
    * then min lang) tiebreak.
    *
    * @return (idCol, predicted) for every input row
    */
  def nbPredict(docs: DataFrame, idCol: String, textCol: String,
                langCol: String, n: Int, trainPred: Column): DataFrame = {
    val d = docs.select(col(idCol).as("__id"), col(langCol).as("__lang"),
      lower(trim(col(textCol))).as("__t"), trainPred.as("__train"))
    // per-doc gram counting fused into ONE JVM pass (the TextFns
    // .textStats rationale): emitting each doc's (gram → count) map and
    // exploding it ships ~len/distinct-grams× fewer rows than exploding
    // raw grams, and the per-doc groupBy shuffle disappears entirely
    val gramCnt = udf { t: String =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      if (t != null) {
        var i = 0
        while (i + n <= t.length) {
          val g = t.substring(i, i + n)
          m(g) = m.getOrElse(g, 0L) + 1L
          i += 1
        }
      }
      m.toMap
    }
    // train-side pass runs over the TRAIN docs only (filter before the
    // generator, not after — half the gram stream never exists)
    val counts = d.filter(col("__train"))
      .select(col("__lang"), explode(gramCnt(col("__t"))).as(Seq("g", "k")))
      .groupBy(col("__lang"), col("g"))
      .agg(sum(col("k")).as("c"))
    val totals = counts.groupBy("__lang").agg(sum("c").as("tot"))
    val vocab = counts.agg(countDistinct("g").as("v"))
    val dec = DecimalType(18, 6)
    val model = counts.join(totals, "__lang").crossJoin(broadcast(vocab))
      .select(col("__lang"), col("g"),
        round(log((col("c") + 1).cast("double") /
          (col("tot") + col("v")).cast("double")), 6).cast(dec).as("logp"))
    val missPrior = {
      val trainDocs = d.filter(col("__train"))
      val priors = trainDocs.groupBy("__lang").agg(count(lit(1)).as("nd"))
        .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("ntot"))))
        .select(col("__lang"),
          round(log(col("nd").cast("double") / col("ntot").cast("double")), 6)
            .cast(dec).as("prior"))
      totals.crossJoin(broadcast(vocab))
        .select(col("__lang"),
          round(log(lit(1.0) / (col("tot") + col("v")).cast("double")), 6)
            .cast(dec).as("miss"))
        .join(priors, "__lang")
    }
    // gram totals straight from text length (= size of the gram array):
    // an explode-then-count would DROP gramless docs (empty/short text),
    // and every doc must appear in the prediction
    val docTotals = d.select(col("__id"),
      greatest(length(col("__t")) - (n - 1), lit(0)).cast("long").as("ng"))
    // score against every language from PRE-AGGREGATED (doc, gram)
    // counts: k·logp (decimal × long, exact — same value as adding
    // logp k times) instead of fanning the raw gram stream out
    // |langs|-fold into the partial aggregation
    val docGramCounts = d.select(col("__id"),
      explode(gramCnt(col("__t"))).as(Seq("g", "k")))
    val matched = docGramCounts
      .join(broadcast(model), Seq("g"))
      .groupBy(col("__id"), col("__lang"))
      .agg(sum(col("k") * col("logp")).as("s"), sum(col("k")).as("m"))
    val grid = docTotals.crossJoin(broadcast(missPrior))
      .join(matched, Seq("__id", "__lang"), "left")
      .select(col("__id"), col("__lang"),
        (col("prior") + coalesce(col("s"), lit(0).cast(dec)) +
          (col("ng") - coalesce(col("m"), lit(0L))) * col("miss"))
          .as("score"))
    val best = grid.groupBy("__id").agg(max("score").as("best"))
    grid.join(best, "__id")
      .filter(col("score") === col("best"))
      .groupBy("__id").agg(min("__lang").as("predicted"))
      .select(col("__id").as(idCol), col("predicted"))
  }
}
