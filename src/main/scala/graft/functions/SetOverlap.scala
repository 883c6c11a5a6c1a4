package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the number of DISTINCT common elements of
  * two `array<string>` columns — `size(array_intersect(a, b))` without
  * materializing the intersection array.
  *
  * Why not `array_intersect`: the built-in allocates the full
  * intersection array (and, pre-CSE, is easily written twice in a
  * Jaccard formula) only for its length to be taken. This expression is
  * one hash-probe loop in generated Java — build a set from the smaller
  * side, probe with the larger, remove on match so duplicates on either
  * side count once (exactly `array_intersect`'s distinct semantics).
  * The verify stage of every shingle-based dedup join (q24/q25/q38/q46)
  * runs this per candidate pair; at corpus scale that is billions of
  * candidate rows through one codegen'd loop with zero per-row
  * allocation beyond the probe set.
  *
  * Null elements inside the arrays are ignored (shingle sets never
  * contain them; `array_intersect` would propagate a null element, the
  * one divergence — documented rather than paid for on every row).
  */
case class SetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "set_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (small, big) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val set = new java.util.HashSet[Object](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var cnt = 0L
    i = 0
    while (i < big.numElements()) {
      if (!big.isNullAt(i) && set.remove(big.getUTF8String(i))) cnt += 1L
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val arrayData = classOf[ArrayData].getName
      s"""
         |$arrayData $small = $a.numElements() <= $b.numElements() ? $a : $b;
         |$arrayData $big = $a.numElements() <= $b.numElements() ? $b : $a;
         |java.util.HashSet<Object> $set =
         |  new java.util.HashSet<Object>($small.numElements() * 2);
         |for (int $i = 0; $i < $small.numElements(); $i++) {
         |  if (!$small.isNullAt($i)) $set.add($small.getUTF8String($i));
         |}
         |long $cnt = 0L;
         |for (int $j = 0; $j < $big.numElements(); $j++) {
         |  if (!$big.isNullAt($j) && $set.remove($big.getUTF8String($j))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}

object SetOverlap {
  val functionName = "graft_set_overlap"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => SetOverlap(exprs(0), exprs(1)), "built-in")

  /** Column form (requires [[register]] on the session first). */
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(functionName, a, b)
  }
}
