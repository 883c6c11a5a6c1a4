package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types._

/** Packed nearest-centroid assignment over FIXED-POINT (scaled-long)
  * vectors — the per-row kernel of [[graft.operators.KMeans]].
  *
  * Returns `minDist * k + argmin` as one LONG: with `argmin < k` the
  * packed value orders lexicographically by `(dist, cid)`, so a single
  * `min` both selects the nearest centroid and breaks exact-distance
  * ties toward the LOWEST centroid id — the same total order the SQL
  * oracle's `ORDER BY dist, cid` uses, and deterministic because the
  * distances are exact integers (no float summation-order ulps).
  * Callers unpack with `pmod(p, k)` / `p div k`.
  *
  * The centroid matrix rides along as a foldable nested-array literal,
  * is extracted once into a `long[][]`, and is reached from generated
  * code via `addReferenceObj` — a tight primitive loop inside
  * WholeStageCodegen, no UDF boxing (the [[CentroidArgmax]] pattern).
  *
  * Overflow bound (caller-checked in KMeans.fit): requires
  * `d * (2 * scale * maxAbs)^2 * k < 2^63`; unit-normalized embeddings
  * at scale 1e6 and d=64 leave ~5 decimal orders of headroom.
  */
case class CentroidPackedArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, foldable array<array<long>>)")
    }

  @transient private lazy val matrix: Array[Array[Long]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      Array.tabulate(row.numElements())(j => row.getLong(j))
    }
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_centroid_packed_argmin"

  /** Shared by eval and the spec's reference model. */
  def packedArgmin(v: ArrayData, m: Array[Array[Long]]): Long = {
    val k = m.length
    var best = Long.MaxValue
    var c = 0
    while (c < k) {
      val cent = m(c)
      val n = math.min(v.numElements(), cent.length)
      var d2 = 0L; var i = 0
      while (i < n) {
        val diff = v.getLong(i) - cent(i)
        d2 += diff * diff
        i += 1
      }
      val p = d2 * k + c
      if (p < best) best = p
      c += 1
    }
    best
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    packedArgmin(a.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("centroids", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val cent = ctx.freshName("cent")
      val d2 = ctx.freshName("d2"); val diff = ctx.freshName("diff")
      val p = ctx.freshName("p"); val best = ctx.freshName("best")
      s"""
         |long $best = Long.MAX_VALUE;
         |for (int $c = 0; $c < $mref.length; $c++) {
         |  long[] $cent = $mref[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cent.length);
         |  long $d2 = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $diff = $a.getLong($i) - $cent[$i];
         |    $d2 += $diff * $diff;
         |  }
         |  long $p = $d2 * $mref.length + $c;
         |  if ($p < $best) $best = $p;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidPackedArgmin =
    copy(left = newLeft, right = newRight)
}

object CentroidPackedArgmin {
  val functionName = "graft_centroid_packed_argmin"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => CentroidPackedArgmin(exprs(0), exprs(1)), "built-in")

  def apply(spark: SparkSession, fixedVec: Column,
            centroids: Array[Array[Long]]): Column = {
    register(spark)
    call_function(functionName, fixedVec,
      typedLit(centroids.map(_.toSeq).toSeq))
  }
}
