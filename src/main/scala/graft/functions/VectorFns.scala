package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate`).
  *
  * All arithmetic is done in DOUBLE after casting each element — float
  * accumulation order would otherwise make results engine-dependent; a
  * left-to-right double fold is deterministic and matches the DuckDB
  * oracle bit-for-bit.
  */
object VectorFns {

  /** Cast array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right sum fold of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<float> columns, in double. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  /** L2 norm in double. */
  def l2Norm(v: Column): Column = {
    val d = toDouble(v)
    sqrt(arraySum(zip_with(d, d, (x, y) => x * y)))
  }

  /** Cosine similarity of two array<float> columns (double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** md5-derived uint64 of a string column — the little-endian value of
    * the FIRST 8 digest bytes, bit-for-bit DuckDB's `md5_number_upper`
    * (the [[graft.functions.Hashing.md5TokenHashes]] convention, as an
    * expression): reverse the first 8 hex byte pairs, then `conv` base
    * 16 → 10 as an unsigned 64-bit value carried in DECIMAL(20,0).
    */
  def md5Num(s: Column): Column = {
    val hex = md5(s.cast("binary"))
    val rev = concat((0 until 8).reverse.map(b => substring(hex, b * 2 + 1, 2)): _*)
    conv(rev, 16, 10).cast(org.apache.spark.sql.types.DecimalType(20, 0))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products
    * with deterministic pseudo-random hyperplanes whose components are
    * md5-derived — `(md5num(plane + "_" + dim) mod 1000)/1000 − 0.5`,
    * replayable in DuckDB via `md5_number_upper` (the same
    * md5-for-the-oracle trade q26/q35 made for SimHash: ~10× costlier
    * per component than a splitmix mix, which the bucketed ANN probe
    * path q29 can afford, and it buys an EXACT SQL oracle for an
    * otherwise recall-judged operator). Returned as a bit string usable
    * as a bucket key — vectors in the same bucket are cosine-close with
    * high probability, so ANN search shuffles only per-bucket groups
    * instead of the full O(n²) cross join.
    */
  /** Plane component for (plane, dim): `(md5num("p_i") mod 1000)/1000 −
    * 0.5` — md5num per [[md5Num]]'s convention. Computed DRIVER-SIDE
    * (the components are constants; an expression-side md5 would
    * recompute every component per ROW — measured 0.3 s → 8.7 s on the
    * q29 bench) and embedded as array literals; the SQL oracle derives
    * the very same values from `md5_number_upper` per element.
    */
  def hyperplaneComponents(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (p, i) =>
      java.lang.Long.remainderUnsigned(
        graft.functions.Hashing.md5Hash64(s"${p}_$i"), 1000L) / 1000.0 - 0.5
    }

  def hyperplaneSignature(v: Column, bits: Int): Column =
    hyperplaneSignature(v, bits, dim = 64)

  def hyperplaneSignature(v: Column, bits: Int, dim: Int): Column = {
    val d = toDouble(v)
    val comp = hyperplaneComponents(bits, dim)
    concat_ws("",
      (0 until bits).map { p =>
        val proj = aggregate(
          zip_with(d, typedLit(comp(p)), (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
  }
}
