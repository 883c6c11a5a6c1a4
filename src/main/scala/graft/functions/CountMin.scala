package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native Catalyst `TypedImperativeAggregate`: one pass over a string
  * column with `depth × width` longs of state, returning the flattened
  * counter matrix as `array<bigint>` (row-major: cell `r·width + b`).
  *
  * Point estimate for key t: `min over r of cell(r, h_r(t) mod width)`.
  * Guarantees: `exact ≤ est` always (counters only ever add), and
  * `est ≤ exact + ε·n` with probability ≥ 1−δ for ε = e/width,
  * δ = e^−depth. Unlike [[MisraGries]] (whose estimates depend on
  * partition merge order), the CMS counter matrix is a SUM of per-row
  * one-hot updates — fully commutative — so the sketch, and every point
  * estimate read from it, is bit-identical for any partitioning, merge
  * order, or cluster size. That is what lets q152 put the ESTIMATES
  * themselves (not just error-bound booleans, the q55 fallback) inside
  * the exact DuckDB oracle gate.
  *
  * Row hashes are oracle-replayable by construction: bucket of key t in
  * row r is `floorMod(md5Hash64("cms" + r + ":" + t), width)` —
  * [[Hashing.md5Hash64]] is bit-for-bit DuckDB `md5_number_upper`
  * (little-endian first 8 digest bytes), and `width` is REQUIRED to be
  * a power of two so the JVM's `floorMod` over the signed 64-bit
  * reinterpretation and DuckDB's unsigned `% width` both reduce to the
  * same low bits of the digest. (For a non-power-of-two width the two
  * conventions diverge on values with the sign bit set; the oracle
  * replay in q152Sql carries no signed fixup, so the constructor
  * rejects such widths rather than silently breaking parity.)
  *
  * Scale shape: Spark's partial aggregation builds per-task sketches
  * map-side and ships ONE `depth·width·8`-byte buffer per task through
  * the exchange — the (token, count) universe (billions of distinct
  * keys at 100 TB) never shuffles. Merge is elementwise add. The same
  * mergeability makes it streaming-composable: a per-batch sketch added
  * into persistent state equals the whole-stream sketch exactly (pinned
  * in CountMinSpec), with none of MG's trim-on-merge bound loss.
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")
  require((width & (width - 1)) == 0,
    s"width must be a power of two (oracle-replay convention: unsigned vs " +
      s"floorMod bucket reduction only agree on low bits), got $width")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(k, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bytes)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

object CountMin {
  val functionName = "graft_count_min"

  /** Row-r bucket of key k — the md5 convention shared with the DuckDB
    * oracle (see class doc). floorMod keeps it in [0, width).
    */
  def bucket(k: String, r: Int, width: Int): Int =
    java.lang.Math.floorMod(Hashing.md5Hash64("cms" + r + ":" + k),
      width.toLong).toInt

  /** Driver-side point estimate from an eval'd sketch (row-major flat). */
  def estimate(sketch: Array[Long], k: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(k, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"$functionName takes exactly 3 arguments (column, depth, width)")
    require(exprs(1).foldable && exprs(2).foldable,
      s"$functionName depth and width must be literals")
    CountMin(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue,
      exprs(2).eval().asInstanceOf[Number].intValue)
      .toAggregateExpression()
  }

  /** Register in the session's function registry (idempotent), enabling
    * both the Column API below and SQL `graft_count_min(col, d, w)`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, build, "built-in")

  /** Column form (registers on the session as a side effect). */
  def apply(spark: SparkSession, column: Column, depth: Int, width: Int): Column = {
    register(spark)
    call_function(functionName, column,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))
  }
}
