package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve keys as pure column algebra.
  *
  * Interleaving the bits of two dimension keys produces a single sort
  * key whose total order visits the 2-D grid in the Z (Morton) curve:
  * points close in BOTH dimensions land close on the curve, so files
  * written in z-key ranges carry narrow min/max envelopes on EVERY
  * interleaved dimension and parquet footer statistics prune multi-
  * dimensional box predicates — the layout trick behind
  * OPTIMIZE ZORDER in log-structured table formats, here as a plain
  * write-time arrangement any reader benefits from.
  *
  * Everything below is shift/mask long arithmetic on built-in
  * codegen'd functions (no UDF, no custom expression needed): the
  * classic power-of-two "spread" sequence places the low 31 bits of a
  * value into the even bit positions of a long in 5 shift-or-mask
  * steps, and the identical expression tree is spelled in the DuckDB
  * oracle, so z-keys are bit-exact across engines.
  */
object ZOrderCols {

  private val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** The low 31 bits of `x` spread into the even bit positions
    * (bit i of `x` lands at bit 2i). Masking to 31 bits keeps the
    * interleaved key inside the non-negative long range, so the
    * signed total order IS the curve order. */
  def spreadBits(x: Column): Column =
    spreadSteps.foldLeft(
      x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (c, (sh, mask)) =>
        c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(mask))
    }

  /** The Morton code of `(a, b)`: bits of `a` at even positions, bits
    * of `b` at odd. Both inputs must lie in [0, 2^31); larger values
    * have their high bits dropped by the spread mask. */
  def mortonCode(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))
}
