package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata schema-drift canary.
  *
  * Round 7 lost 15 queries and 9 tests to a silent driver-side testdata
  * regeneration (`events.ts` TIMESTAMP(NANOS) → timestamp[us]). This spec
  * pins the schema of every table AS LOADED through [[Tables]] so the next
  * regeneration fails here, in one obvious place that names the drifted
  * column, instead of in fifteen obscure ones.
  *
  * Timestamp columns are normalized to a single "timestamp" token:
  * NTZ↔LTZ drift is harmless under the UTC session timezone every
  * entrypoint sets (and [[Tables.events]] already normalizes `ts`), but a
  * width/rename/long drift is exactly what this canary must catch.
  */
class TablesSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def normalize(dt: DataType): String = dt match {
    case TimestampType | TimestampNTZType => "timestamp"
    case ArrayType(e, _)                  => s"array<${normalize(e)}>"
    case other                            => other.simpleString
  }

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
      expected: Seq[(String, String)]): Unit = {
    val actual = df.schema.fields.toSeq.map(f => (f.name, normalize(f.dataType)))
    val drifted = expected.zipAll(actual, ("<missing>", ""), ("<extra>", ""))
      .collect { case (e, a) if e != a => s"expected $e but loaded $a" }
    assert(drifted.isEmpty,
      s"\ntestdata schema drift in table '$name': ${drifted.mkString("; ")}" +
        s"\n  full loaded schema: ${actual.mkString(", ")}")
  }

  test("all table schemas match the pinned testdata contract") {
    check("region", Tables.region(spark, dir), Seq(
      "r_regionkey" -> "int", "r_name" -> "string"))
    check("nation", Tables.nation(spark, dir), Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"))
    check("customer", Tables.customer(spark, dir), Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"))
    check("supplier", Tables.supplier(spark, dir), Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"))
    check("part", Tables.part(spark, dir), Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"))
    check("orders", Tables.orders(spark, dir), Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"))
    check("lineitem", Tables.lineitem(spark, dir), Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"))
    check("events", Tables.events(spark, dir), Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))
    check("documents", Tables.documents(spark, dir), Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
    check("embeddings", Tables.embeddings(spark, dir), Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
  }

  test("events ts is a concrete TimestampType after loader normalization") {
    // Downstream window/interval/streaming logic assumes LTZ micros; the
    // loader must deliver that for nanos-long, NTZ-micros, and LTZ files.
    assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType)
  }
}
