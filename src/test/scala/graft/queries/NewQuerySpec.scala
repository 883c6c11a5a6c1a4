package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the round-7 quality/selection queries that
  * the DuckDB oracle can't express: entropy bounds, quota invariance
  * under partitioning, and the bigram model's self-consistency.
  */
class NewQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q89: 0 <= char entropy <= ln(distinct chars), exact on a crafted doc") {
    val rows = TextQueries.q89(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val distinct = r.getLong(2)
      val h = r.getDouble(3)
      assert(h >= 0.0 && h <= math.log(distinct.toDouble) + 1e-9,
        s"doc ${r.getLong(0)}: H=$h outside [0, ln($distinct)]")
    }
    // hand-checkable: "aabb" -> H = ln 2; "aaaa" -> H = 0
    import spark.implicits._
    val crafted = Seq((1L, "aabb"), (2L, "aaaa")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFns.charStats(col("text")).as("cs"))
      .select(col("doc_id"), round(col("cs._1"), 4).as("h"),
        col("cs._2").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(crafted(1L) == (BigDecimal(math.log(2.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 2L))
    assert(crafted(2L) == (0.0, 1L))
  }

  test("q87: kept set is a function of content, not partitioning") {
    val base = CorpusQueries.q87(spark, dir).collect().map(_.toSeq)
    // same query over a repartitioned input must keep the SAME docs
    val docs = graft.Tables.documents(spark, dir).repartition(17)
    val alt = docs
      .select(col("source"),
        struct(md5(concat(col("doc_id").cast("string"), lit(":quota"))).as("h"),
          col("doc_id").as("id")).as("key"))
      .groupBy("source")
      .agg(graft.functions.TopKRows(spark, col("key"), 20).as("keep"))
      .select(col("source"), explode(col("keep")).as("kv"))
      .select(col("source"), col("kv.id").as("doc_id"))
      .orderBy("source", "doc_id")
      .collect().map(_.toSeq)
    assert(base.sameElements(alt))
    // every source capped at 20
    val bySource = base.groupBy(_.head).view.mapValues(_.size)
    assert(bySource.values.forall(_ <= 20))
  }

  test("q86: every scored doc has n_bigrams = n_tokens - 1, scores positive") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = CorpusQueries.q86(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == toks(r.getLong(0)) - 1L)
      // MLE self-scoring: every observed bigram has c2 >= 1 and c2 <= c1
      // so -ln(c2/c1) >= 0
      assert(r.getDouble(1) >= 0.0)
    }
    assert(rows.map(_.getLong(0)).toSet == toks.filter(_._2 >= 2).keySet)
  }
}
