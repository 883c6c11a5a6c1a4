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

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes derived from xxhash64(planeIdx,
    * dimIdx). Returned as a bit string usable as a bucket key — vectors in
    * the same bucket are cosine-close with high probability, so ANN search
    * shuffles only per-bucket groups instead of the full O(n²) cross join.
    */
  def hyperplaneSignature(v: Column, bits: Int): Column = {
    val d = toDouble(v)
    concat_ws("",
      (0 until bits).map { p =>
        // plane component for dim i: xxhash64(p, i) mapped to [-0.5, 0.5)
        val proj = aggregate(
          zip_with(d, sequence(lit(0), size(d) - 1),
            (x, i) => x * ((pmod(xxhash64(lit(p), i), lit(1000L)).cast("double") / 1000.0) - 0.5)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
  }
}
