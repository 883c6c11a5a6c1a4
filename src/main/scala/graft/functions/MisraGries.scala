package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate`: one pass over a string column with at most
  * `width − 1` counters of state, returning a `map<string,bigint>` of
  * candidate → estimated count.
  *
  * Guarantees (the Frequent-algorithm bound adjusted for the batch
  * decrement below, preserved under the mergeable-summaries merge of
  * Agarwal et al., "Mergeable Summaries", PODS'12): for every key,
  * `true − n/(width−1) ≤ estimate ≤ true`, so any key with true count
  * > n/(width−1) is GUARANTEED to survive. The (width−1) denominator —
  * not the classic n/width — is the price of batch-decrementing by the
  * buffer minimum m on a SINGLE arrival instead of running m unit
  * rounds (each of which would need its own arrival): mass
  * conservation gives Σm·(width−1) + 1 ≤ n per eviction event, hence
  * total decrement Σm ≤ n/(width−1). Size widths against THIS bound
  * (e.g. Skew.adaptiveSaltedAggregate uses ceil(2/f)+1). That makes
  * the sketch a sound candidate filter for exact heavy-hitter queries:
  * sketch → tiny candidate set → exact recount of candidates only
  * (see CorpusQueries.q71) — the two-pass shape that avoids ever
  * shuffling the full (token, count) universe at corpus scale.
  *
  * Why a `TypedImperativeAggregate` (SURVEY §2.8 — the one aggregate
  * class the reference surface never needed): the buffer is a genuine
  * sketch, not a fixed-width row, and Spark's partial-aggregation
  * machinery then gives the distributed algorithm for free — per-task
  * sketches built map-side, serialized once per partition, merged on the
  * reduce side. State is bounded by `width` regardless of input size;
  * overflow inside a partition batch-decrements by the current minimum
  * count (NOT equivalent to unit-decrement rounds — it weakens the
  * bound from n/width to n/(width−1), documented above, in exchange
  * for amortized-cheaper eviction); merge sums counts and rescales by
  * the `width`-th largest.
  *
  * Output is partition-layout-dependent in its ESTIMATES (like any
  * merge-order-dependent sketch — q55's HLL likewise), which is why q71
  * re-counts exactly instead of reporting estimates.
  */
case class MisraGries(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(width >= 2, s"width must be >= 2, got $width")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None if buf.size < width - 1 => buf(k) = 1L
        case None =>
          // batch decrement by the minimum — one pass evicts every
          // min-count key; bound is n/(width-1), see class scaladoc
          val m = buf.valuesIterator.min
          buf.filterInPlace((_, c) => c > m)
          buf.mapValuesInPlace((_, c) => c - m)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > width - 1) {
      // keep the top width-1 by subtracting the width-th largest count
      val c = buf.values.toArray.sortBy(-_).apply(width - 1)
      buf.filterInPlace((_, v) => v > c)
      buf.mapValuesInPlace((_, v) => v - c)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(e => Long.box(e._2))))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  val functionName = "graft_heavy_hitters"

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$functionName takes exactly 2 arguments (column, width)")
    require(exprs(1).foldable, s"$functionName width must be a literal")
    MisraGries(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue)
      .toAggregateExpression()
  }

  /** Register in the session's function registry (idempotent), enabling
    * both the Column API below and SQL `graft_heavy_hitters(col, w)`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, build, "built-in")

  /** Column form (registers on the session as a side effect). */
  def apply(spark: SparkSession, column: Column, width: Int): Column = {
    register(spark)
    call_function(functionName, column,
      org.apache.spark.sql.functions.lit(width))
  }
}
