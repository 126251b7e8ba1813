package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional storage layout.
  *
  * Sorting a table by one column gives min/max data skipping on that
  * column only; sorting by the bit-interleaved key of two quantized
  * dimensions gives useful min/max bounds on BOTH — the standard layout
  * trick (Delta/Iceberg `ZORDER BY`) for corpora that are filtered by
  * more than one axis (length band AND quality band, date AND domain).
  * Pure column arithmetic: shift/mask/add, codegen-friendly, no UDF —
  * and exactly replayable in the oracle's SQL dialect.
  *
  * Use with [[TrainingExport]]-style writes: `sortWithinPartitions(zkey)`
  * instead of the single-key sort when readers filter on two dimensions.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions) into a 2·bits-bit Morton key. Inputs are masked to
    * `bits` bits first, so out-of-range values wrap rather than collide
    * across buckets. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
