package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for IVF / product-quantization vector
  * search (the ROADMAP item: "IVF assignment UDF → codegen").
  *
  * All three take their trained tables (centroid matrix, codebooks,
  * query lookup tables) as FOLDABLE literal children: the Column API
  * wraps the Scala arrays with `typedLit`, each expression extracts the
  * table once into a plain Java array, and whole-stage codegen reaches
  * it through `addReferenceObj` — so the generated per-row code is a
  * tight primitive loop over `float[][]`, with none of the
  * serialize-a-closure / box-every-element costs of a Scala UDF, and
  * the scan stays inside WholeStageCodegen like any builtin.
  *
  *  - [[CentroidArgmax]] — index of the max-cosine centroid; the IVF
  *    assignment step (hot: every Lloyd round scans the corpus).
  *  - [[PqEncode]] — per-subspace argmin-L2 codes, one byte per
  *    subspace (index build; `CodegenFallback` is fine off the hot
  *    query path).
  *  - [[PqAdcScore]] — asymmetric-distance cosine approximation from a
  *    query's dot/norm lookup tables (hot: the probe scan reads m
  *    bytes per row instead of the full float vector — the 100 TB
  *    memory-bandwidth win of PQ).
  */
case class CentroidArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<array<float>>)")
    }

  @transient private lazy val matrix: Array[Array[Float]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      Array.tabulate(row.numElements())(j => row.getFloat(j))
    }
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_centroid_argmax"

  /** Shared by eval and the recall/oracle tests: cosine argmax with
    * first-wins tiebreak (strictly-greater keeps the lowest index).
    */
  def argmaxCosine(v: ArrayData, m: Array[Array[Float]]): Int = {
    var best = -1; var bestCos = Double.MinValue
    var c = 0
    while (c < m.length) {
      val cent = m(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    argmaxCosine(a.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("centroids", matrix, "float[][]")
    defineGen(ctx, ev, mref)
  }

  private def defineGen(ctx: CodegenContext, ev: ExprCode, mref: String): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val cos = ctx.freshName("cos")
      val best = ctx.freshName("best"); val bestCos = ctx.freshName("bestCos")
      s"""
         |int $best = -1; double $bestCos = -Double.MAX_VALUE;
         |for (int $c = 0; $c < $mref.length; $c++) {
         |  float[] $cent = $mref[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double x = (double) $a.getFloat($i);
         |    double y = (double) $cent[$i];
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($cos > $bestCos) { $bestCos = $cos; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}

object CentroidArgmax {
  val functionName = "graft_centroid_argmax"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => CentroidArgmax(exprs(0), exprs(1)), "built-in")

  /** Column form: `centroids` ride along as a nested-array literal. */
  def apply(spark: SparkSession, emb: Column,
            centroids: Array[Array[Float]]): Column = {
    register(spark)
    call_function(functionName, emb,
      typedLit(centroids.map(_.toSeq).toSeq))
  }
}

/** PQ codes: for each of the m subspaces, the byte index of the
  * L2-nearest codeword. Output is `binary` — m bytes per vector, the
  * whole point of the representation. Index-build-time only, hence
  * interpreted eval (CodegenFallback).
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable codebooks array<array<array<float>>>)")
    }

  @transient private lazy val codebooks: Array[Array[Array[Float]]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { s =>
      val book = ad.getArray(s)
      Array.tabulate(book.numElements()) { j =>
        val cw = book.getArray(j)
        Array.tabulate(cw.numElements())(d => cw.getFloat(d))
      }
    }
  }

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Byte](codebooks.length)
    var s = 0; var off = 0
    while (s < codebooks.length) {
      val book = codebooks(s)
      val dsub = book(0).length
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val cw = book(j)
        var d2 = 0.0; var i = 0
        while (i < dsub && off + i < v.numElements()) {
          val diff = v.getFloat(off + i).toDouble - cw(i).toDouble
          d2 += diff * diff; i += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(s) = best.toByte
      off += dsub; s += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  val functionName = "graft_pq_encode"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => PqEncode(exprs(0), exprs(1)), "built-in")

  def apply(spark: SparkSession, emb: Column,
            codebooks: Array[Array[Array[Float]]]): Column = {
    register(spark)
    call_function(functionName, emb,
      typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq))
  }
}

/** ADC cosine approximation: `dotSum / sqrt(normSum)` where
  * `dotSum = Σ_s dotLut[s][code_s]` (query·codeword, pre-divided by
  * ‖query‖) and `normSum = Σ_s normLut[s][code_s]` (codeword norm²
  * contributions). One byte-indexed table lookup per subspace — the
  * probe scan never touches the float vectors.
  */
case class PqAdcScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, ArrayType(ArrayType(FloatType, _), _),
            ArrayType(ArrayType(FloatType, _), _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, foldable array<array<float>> ×2)")
    }

  private def toMatrix(e: Expression): Array[Array[Float]] = {
    val ad = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      Array.tabulate(row.numElements())(j => row.getFloat(j))
    }
  }
  @transient private lazy val dotLut: Array[Array[Float]] = toMatrix(second)
  @transient private lazy val normLut: Array[Array[Float]] = toMatrix(third)

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_adc_score"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    var dot = 0.0; var norm = 0.0
    var s = 0
    while (s < codes.length && s < dotLut.length) {
      val j = codes(s) & 0xff
      dot += dotLut(s)(j); norm += normLut(s)(j)
      s += 1
    }
    if (norm <= 0.0) 0.0 else dot / math.sqrt(norm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dref = ctx.addReferenceObj("dotLut", dotLut, "float[][]")
    val nref = ctx.addReferenceObj("normLut", normLut, "float[][]")
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val dot = ctx.freshName("dot"); val norm = ctx.freshName("norm")
      s"""
         |double $dot = 0.0, $norm = 0.0;
         |for (int $s = 0; $s < $a.length && $s < $dref.length; $s++) {
         |  int $j = $a[$s] & 0xff;
         |  $dot += $dref[$s][$j]; $norm += $nref[$s][$j];
         |}
         |${ev.value} = ($norm <= 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($norm);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcScore {
  val functionName = "graft_pq_adc_score"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => PqAdcScore(exprs(0), exprs(1), exprs(2)), "built-in")

  def apply(spark: SparkSession, codes: Column, dotLut: Array[Array[Float]],
            normLut: Array[Array[Float]]): Column = {
    register(spark)
    call_function(functionName, codes,
      typedLit(dotLut.map(_.toSeq).toSeq), typedLit(normLut.map(_.toSeq).toSeq))
  }
}
