package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `right.ts <= left.ts` within the same key — the event-enrichment
  * operator Spark lacks natively (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Implementation choice (per the custom-operator preference order —
  * compose built-ins first): tag both sides, union, and run one
  * `last_value(..., ignoreNulls)` window ordered by (ts, side). This plans
  * as ONE shuffle on the key + one sort — exactly what a hand-written
  * merge-join SparkPlan would do, so a custom physical operator buys
  * nothing here. A naive range-join formulation would instead explode to
  * O(|L|·|R|) per key.
  *
  * Tie semantics: at equal ts the right row sorts before the left row
  * (side 0 < side 1), so `ts >= right.ts` is inclusive, matching DuckDB.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (each emitted as
    *                  `asof_<name>`); right rows ordered by (ts, tiebreak).
    */
  def lastPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, valueCols: Seq[String],
                tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val leftCols = left.columns
    val side = "__asof_side"
    val ordering: Seq[Column] =
      (col(tsCol) +: col(side) +: tiebreak.map(col)).toSeq
    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as(side)) ++
        tiebreak.filterNot(keys.contains).filterNot(_ == tsCol).map(col) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.withColumn(side, lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    withAsof.filter(col(side) === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
