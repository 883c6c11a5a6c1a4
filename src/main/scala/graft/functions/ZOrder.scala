package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-dimensional data layout —
  * the interleaved-bits space-filling curve behind Delta Lake's
  * `OPTIMIZE ZORDER BY` and every multi-column clustered layout: sort
  * by the z-value and each output file covers a small RECTANGLE of the
  * (a, b) key space instead of a thin slice of one key, so parquet
  * min/max stats prune file scans for predicates on EITHER dimension.
  *
  * Built from Spark's codegen'd bitwise builtins (`shiftleft`,
  * `bitwiseAND/OR`) — no UDF, stays inside whole-stage codegen — and
  * from exact BIGINT arithmetic only, so the same formula replayed in
  * any engine produces identical codes (the SQL-oracle property).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,…,30 —
    * the classic magic-number doubling chain.
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: bits of `a` at even
    * positions, bits of `b` at odd.
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Proportional 16-bit bucketization of `v` over the inclusive
    * domain [mn, mx]: `floor((v − mn) · 65536 / (mx − mn + 1))`,
    * mapping the domain onto 0…65535. The numerator is an exact BIGINT
    * product (≤ 2^53 for any realistic key domain) and the single
    * double division is correctly rounded, so the floor equals exact
    * integer division — |num − m·den| is an integer and the half-ulp
    * window at these magnitudes is ≪ 1, so a near-integer quotient IS
    * an integer. Identical in any engine that divides doubles.
    */
  def bucket16(v: Column, mn: Column, mx: Column): Column =
    floor(((v - mn) * lit(65536L)) / (mx - mn + lit(1L))).cast("long")
}
