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

/** KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al., "Theta
  * sketch framework", 2016 — the DataSketches family): keep the `k`
  * MINIMUM distinct 64-bit hash values of a column. Distinct count is
  * estimated from how deep into the hash space those k minima reach,
  * and — unlike HLL (q55), which can only union — two KMV sketches
  * support set INTERSECTION estimates: trim both to the smaller theta,
  * count shared values. That's the cross-source overlap question
  * ("how many distinct shingles do CC and Books share?") answered from
  * two kilobyte-sized summaries instead of a corpus-scale join.
  *
  * Distributed shape: same as [[MisraGries]] — map-side partial
  * sketches, one serialized buffer per partition, reduce-side merge.
  * The merge (union retained sets, keep the k smallest) is exact set
  * algebra, so the final sketch — and therefore the ESTIMATE — is
  * independent of partitioning and merge order: a reproducibility
  * property HLL register-maxing shares but approximate-median sketches
  * don't. Error: the unbiased estimator (k−1)/θ has relative standard
  * error ≈ 1/√(k−2) (~3.2% at k=1024, 1 KB of state per group).
  *
  * Output: the sorted retained hash array (≤ k values, each in
  * [0, 2⁶³)). Estimation and set ops are driver/consumer-side
  * functions over these arrays ([[KmvSketch.estimate]],
  * [[KmvSketch.intersectionEstimate]]) — the sketches are tiny by
  * construction, so set algebra over them never needs the cluster.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 16, s"k must be >= 16, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // md5-derived (r9, was FNV+splitmix): ~10× costlier per value,
      // but DuckDB's md5_number_upper replays it bit-for-bit, which
      // upgrades q113 from rows-only to an EXACT SQL oracle — the
      // sketch is a deterministic function of the input once the hash
      // is engine-replayable. Uniformity for order statistics is
      // md5-grade, strictly better than the FNV+splitmix mix.
      val h = Hashing.md5Hash64(v.asInstanceOf[UTF8String].toString) & Long.MaxValue
      add(buf, h)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  val functionName = "graft_kmv_sketch"

  private val HashSpace = Long.MaxValue.toDouble // hashes are uniform in [0, 2^63)

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$functionName takes exactly 2 arguments (column, k)")
    require(exprs(1).foldable, s"$functionName k must be a literal")
    KmvSketch(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue)
      .toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, build, "built-in")

  def apply(spark: SparkSession, column: Column, k: Int): Column = {
    register(spark)
    call_function(functionName, column,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Unbiased distinct-count estimate from a retained-minima array.
    * Exact (the retained set IS the value set) when fewer than k values
    * were ever seen.
    */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch.last.toDouble / HashSpace)

  /** Estimated |A ∩ B| from two same-k sketches: trim both to the
    * smaller theta (the k-th minimum of the fuller sketch), count
    * common survivors c, scale by the sampled fraction — the theta
    * sketch intersection rule.
    */
  def intersectionEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val exactA = a.length < k
    val exactB = b.length < k
    // theta stays a LONG until the one final division: the long→double
    // promotion loses low bits above 2^53, so a double theta makes
    // `h < theta` engine-dependent at the boundary; integer compares
    // are exact and replay identically in SQL
    val thetaA = if (exactA) Long.MaxValue else a.last
    val thetaB = if (exactB) Long.MaxValue else b.last
    val theta = math.min(thetaA, thetaB)
    val sa = a.filter(_ < theta).toSet
    val common = b.filter(_ < theta).count(sa.contains)
    if (exactA && exactB) common.toDouble
    else common.toDouble / (theta.toDouble / HashSpace)
  }
}
