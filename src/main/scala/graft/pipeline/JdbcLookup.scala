package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse lookup with IN-list pushdown — the reference ships each
  * batch's keys to Redshift instead of scanning the table
  * (lib/pipeline_controller.py:317-323, 338-344, 418-424;
  * helpers/query_helper.py:42-60). A plain `spark.read.jdbc` + join would
  * full-scan the warehouse table (SURVEY §4: the one genuinely
  * "optimizer-ish" decision) — here the keys are embedded into the pushed
  * query instead.
  *
  * Scale note: the key set is one micro-batch's keys (≤ the poll limit),
  * so collecting it to the driver is bounded by config, exactly like the
  * reference's string-built IN lists. Past `maxInList` keys, callers
  * should fall back to [[PatronPipeline.staticLookup]] (semi-join against
  * a full table read) — shipping megabyte SQL strings loses to a scan.
  */
object JdbcLookup {

  /** `SELECT cols FROM table WHERE keyCol IN ('k1','k2',...)` with
    * single-quote escaping (the reference's IN lists are built from
    * already-obfuscated values; escaping makes this safe for any input).
    */
  def inListQuery(table: String, selectCols: Seq[String], keyCol: String,
                  keys: Seq[String]): String = {
    val list = keys.map(k => "'" + k.replace("'", "''") + "'").mkString(",")
    s"SELECT ${selectCols.mkString(", ")} FROM $table WHERE $keyCol IN ($list)"
  }

  /** A Deps-compatible lookup: collects the (batch-bounded) key set and
    * issues one pushed-down JDBC query.
    */
  def lookup(spark: SparkSession, url: String,
             props: java.util.Properties, table: String,
             selectCols: Seq[String], keyCol: String,
             maxInList: Int = 100000): DataFrame => DataFrame = { keysDf =>
    val keys = keysDf.select(keyCol).distinct()
      .collect().map(_.getString(0)).toSeq.filter(_ != null)
    require(keys.size <= maxInList,
      s"IN-list lookup got ${keys.size} keys (> $maxInList); use staticLookup")
    if (keys.isEmpty)
      spark.read.jdbc(url, s"(SELECT ${selectCols.mkString(", ")} FROM $table WHERE 1=0) g", props)
    else
      spark.read.jdbc(url,
        s"(${inListQuery(table, selectCols, keyCol, keys)}) g", props)
  }
}
