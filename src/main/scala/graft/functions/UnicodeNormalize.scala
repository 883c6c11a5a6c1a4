package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string column — the standard first step of a text
  * cleaning pipeline (combining-sequence "é" and precomposed "é"
  * are the same text; un-normalized corpora split token counts, dedup
  * hashes and vocabulary entries across the two encodings).
  *
  * Codegen'd (stays inside WholeStageCodegen; no Scala-UDF
  * serialization), with an ASCII fast path: a UTF8String whose byte
  * count equals its char count is pure ASCII, already NFC by
  * construction, and is returned without materializing a
  * java.lang.String — on mostly-ASCII corpora the normalizer cost is
  * paid only by rows that can need it.
  *
  * NFC (not NFKC) deliberately: it is the lossless canonical form, and
  * it is what DuckDB's `nfc_normalize` implements, giving the q130
  * oracle an exact cross-engine replay. Compatibility folding (NFKC's
  * ﬁ→fi, ²→2) is a lossy editorial choice layered separately when
  * wanted.
  */
case class UnicodeNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val functionName = "graft_nfc"

  /** NFC-normalize one UTF8String; ASCII (bytes == chars) short-circuits. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // pure ASCII: already NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => UnicodeNormalize(exprs.head), "built-in")

  def apply(spark: SparkSession, s: Column): Column = {
    register(spark)
    call_function(functionName, s)
  }
}
