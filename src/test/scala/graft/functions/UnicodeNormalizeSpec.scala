package graft.functions

import java.text.Normalizer

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UnicodeNormalize (codegen NFC) semantics on crafted non-ASCII input —
  * the sf corpus is ASCII-heavy, so the DuckDB oracle of q130 mostly
  * proves engine parity; the actual composition behavior is pinned here.
  * All non-ASCII is written as \u escapes so the fixture is exactly what
  * it looks like regardless of editor/tooling normalization.
  * Running through DataFrames exercises the generated-code path.
  */
class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("composes combining sequences, is idempotent, preserves ASCII and NBSP") {
    import spark.implicits._
    val decomposed = "Café du cinéma" // e + COMBINING ACUTE
    val precomposed = "Café du cinéma"
    val cases = Seq(
      ("d1", decomposed),
      ("p1", precomposed),
      ("ascii", "plain ascii text 123"),
      ("nbsp", "a b"),        // NBSP is NOT folded by NFC
      ("hangul", "가"),  // conjoining jamo -> syllable GA
      ("empty", ""))
    val got = cases.toDF("k", "s")
      .withColumn("n", UnicodeNormalize(spark, col("s")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("d1") == precomposed)
    assert(got("p1") == precomposed)
    assert(got("ascii") == "plain ascii text 123")
    assert(got("nbsp") == "a b")
    assert(got("hangul") == "가")
    assert(got("empty") == "")
    // idempotent: normalize(normalize(x)) == normalize(x)
    val twice = cases.toDF("k", "s")
      .withColumn("n1", UnicodeNormalize(spark, col("s")))
      .withColumn("n2", UnicodeNormalize(spark, UnicodeNormalize(spark, col("s"))))
      .collect()
    twice.foreach(r => assert(r.getString(2) == r.getString(3), r.getString(0)))
  }

  test("matches java.text.Normalizer on randomized combining-mark strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val marks = Seq("́", "̀", "̈", "") // acute, grave, diaeresis
    val cases = (1 to 200).map { i =>
      val s = (1 to 12).map { _ =>
        ('a' + rnd.nextInt(26)).toChar.toString + marks(rnd.nextInt(marks.size))
      }.mkString
      (i, s)
    }
    val rows = cases.toDF("i", "s")
      .withColumn("n", UnicodeNormalize(spark, col("s")))
      .collect()
    rows.foreach { r =>
      val expected = Normalizer.normalize(r.getString(1), Normalizer.Form.NFC)
      assert(r.getString(2) == expected, r.getInt(0).toString)
    }
  }

  test("null passes through; non-string input is rejected at analysis") {
    import spark.implicits._
    val df = Seq((1, Option.empty[String]), (2, Some("ó"))).toDF("i", "s")
      .withColumn("n", UnicodeNormalize(spark, col("s")))
    val rows = df.orderBy("i").collect()
    assert(rows(0).isNullAt(2))
    assert(rows(1).getString(2) == "ó") // o-acute composes
    intercept[Exception] {
      Seq(1, 2).toDF("i").select(UnicodeNormalize(spark, col("i"))).collect()
    }
  }
}
