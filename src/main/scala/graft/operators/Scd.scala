package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: turn an append-only
  * change log into a temporal dimension of versioned rows with
  * `[valid_from, valid_to)` intervals — the table shape
  * [[graft.operators.AsOfJoin]] and the interval join (q60) consume for
  * point-in-time enrichment. The reference pipeline's "updated patron"
  * flow keeps only the latest row per key; SCD2 is the lake-side
  * generalization every warehouse needs when history must stay
  * queryable (reference: patron_record current-state upsert,
  * `poll.py:131` — here extended to full history retention).
  *
  * Semantics: rows are grouped by `keys` and ordered by `seq` (a
  * deterministic total order within key — pass a tiebreaker column or
  * the build is not reproducible). Consecutive rows whose tracked
  * `attrs` are unchanged (null-safe comparison) COLLAPSE into one
  * version; each surviving version spans from its own `seq` head to the
  * next version's head (`valid_to` null on the open current version),
  * and carries a 1-based `version` ordinal.
  *
  * Scale shape: ONE hash shuffle on `keys`, then two window passes that
  * both run on that same partitioning (the change-detection lag, then —
  * after the in-partition filter, which preserves distribution — the
  * closing lead + version ordinal; Catalyst reuses the exchange, so the
  * log is shuffled once regardless of attribute count). State per task
  * is one partition's sort run — no self-join, no driver collection;
  * a 100 TB change log builds in a single pass bounded by the widest
  * key's history, and AQE's skew split handles pathological keys.
  */
object Scd {

  /** Build the type-2 dimension. Output columns: `keys ++ attrs ++
    * (valid_from, valid_to, version)` where `valid_from`/`valid_to`
    * take the type of `seqCol` and `valid_to` is null for the current
    * (open) version.
    *
    * @param log     append-only change log, one row per observed state
    * @param keys    entity identity columns
    * @param seqCol  event-order column (becomes the interval bound)
    * @param tie     extra deterministic tiebreakers within equal seqCol
    * @param attrs   tracked attribute columns; a change in ANY opens a
    *                new version
    */
  def buildType2(log: DataFrame, keys: Seq[String], seqCol: String,
      tie: Seq[String], attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val order = (seqCol +: tie).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // null-safe "any attribute changed vs previous row" predicate; the
    // first row per key has no predecessor and always opens version 1
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val versions = log
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .drop("__chg")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    versions
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select((keys ++ attrs ++ Seq("valid_from", "valid_to", "version"))
        .map(col): _*)
  }
}
