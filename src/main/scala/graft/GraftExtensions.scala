package graft

import graft.functions.{CentroidPackedArgmin, CosineSimilarity, CountMin, HammingDistance, MisraGries, SetOverlap, TopKRows, UnicodeNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions entry point: registers graft's native functions in
  * every session, including SQL-only ones — wire up with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so `SELECT graft_cosine_similarity(a.embedding, b.embedding)` works
  * from pure SQL on a cluster without any driver-side registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier(CosineSimilarity.functionName),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        CosineSimilarity.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${CosineSimilarity.functionName} takes exactly 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier(HammingDistance.functionName),
      new ExpressionInfo(classOf[HammingDistance].getName,
        HammingDistance.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${HammingDistance.functionName} takes exactly 2 arguments")
        HammingDistance(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier(SetOverlap.functionName),
      new ExpressionInfo(classOf[SetOverlap].getName,
        SetOverlap.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${SetOverlap.functionName} takes exactly 2 arguments")
        SetOverlap(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier(MisraGries.functionName),
      new ExpressionInfo(classOf[MisraGries].getName,
        MisraGries.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${MisraGries.functionName} takes exactly 2 arguments")
        require(exprs(1).foldable,
          s"${MisraGries.functionName} width must be a literal")
        MisraGries(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()
      }))
    extensions.injectFunction((
      FunctionIdentifier(CountMin.functionName),
      new ExpressionInfo(classOf[CountMin].getName,
        CountMin.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"${CountMin.functionName} takes exactly 3 arguments")
        require(exprs(1).foldable && exprs(2).foldable,
          s"${CountMin.functionName} depth and width must be literals")
        CountMin(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue,
          exprs(2).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()
      }))
    extensions.injectFunction((
      FunctionIdentifier(CentroidPackedArgmin.functionName),
      new ExpressionInfo(classOf[CentroidPackedArgmin].getName,
        CentroidPackedArgmin.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"${CentroidPackedArgmin.functionName} takes exactly 2 arguments")
        CentroidPackedArgmin(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier(UnicodeNormalize.functionName),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        UnicodeNormalize.functionName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"${UnicodeNormalize.functionName} takes exactly 1 argument")
        UnicodeNormalize(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier(TopKRows.functionName),
      new ExpressionInfo(classOf[TopKRows].getName,
        TopKRows.functionName),
      (exprs: Seq[Expression]) => TopKRows.build(exprs)))
    // auto-rewrite naive point-in-interval inequality joins to the
    // bucketed hash-join form (see graft.plans.RangeJoinRewrite)
    extensions.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
