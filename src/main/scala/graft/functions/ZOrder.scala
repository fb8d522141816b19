package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the data-LAYOUT primitive of large-scale
  * parquet stores: writing files sorted by the z-value of two columns keeps
  * rows that are close in EITHER dimension inside few files, so min/max
  * footer statistics prune scans on both columns without maintaining two
  * copies of the data (the technique behind Delta/Iceberg `OPTIMIZE ZORDER`).
  *
  * Built from static bit expressions (literal shift amounts, unrolled at
  * plan-build time) — fully inside whole-stage codegen, no UDF, no HOF
  * lambda interpretation.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative long
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Values must fit in `bits` bits (callers bucket/normalize first —
    * layout clustering needs coarse ranks, not exact values).
    */
  def zValue2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
