package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multi-dimensional clustering — the lakehouse
  * `OPTIMIZE ZORDER BY (a, b)` primitive (Delta/Iceberg/Hudi all ship
  * it): interleaving the bits of two grid-quantized dimensions gives a
  * single sort key whose ranges are axis-aligned rectangles, so ONE
  * range-partitioned layout serves range predicates on EITHER (or both)
  * dimensions — per-file min/max stats prune 2-D probes that a
  * single-column sort order can only prune on its leading column.
  *
  * Everything here is codegen'd built-in integer bit arithmetic
  * (shiftleft / & / |) — no UDF, no hex round-trip — so the key costs a
  * few ALU ops per row inside the scan projection. The spread uses the
  * classic magic-number doubling (each step doubles the gap between
  * payload bits):
  *
  *   x = (x | x<<8) & 0x00FF00FF; (x | x<<4) & 0x0F0F0F0F;
  *   (x | x<<2) & 0x33333333;     (x | x<<1) & 0x55555555
  *
  * Scale shape: `layout` is exactly Spark's `repartitionByRange` on the
  * z-key (sampled range boundaries — no global sort materializes) +
  * `sortWithinPartitions`, i.e. one shuffle that IS the rewrite; the
  * audit query (q268) needs no layout at all — the z-cell is a
  * scan-local prefix of the key and the per-cell stats are one
  * partial-aggregable fold.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of a non-negative integral column so bit i
    * lands at position 2i (even positions); odd positions are zero. */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long")
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit grid coordinates: x on even bit
    * positions, y on odd — equal-prefix keys share an axis-aligned
    * rectangle of the (x, y) grid. */
  def zkey2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Quantize a non-negative integral column onto the 16-bit grid given
    * an EXCLUSIVE domain max (v * 2^16 div max — integer floor, so the
    * grid is deterministic and oracle-replayable; max usually comes
    * from a one-row broadcast aggregate or table statistics). */
  def grid16(v: Column, maxExclusive: Column): Column =
    call_function("div", v.cast("long") * lit(65536L), maxExclusive.cast("long"))

  /** The layout rewrite itself: range-partition the frame into
    * `nFiles` z-key ranges and sort each file by the key, so per-file
    * min/max column stats are tight on BOTH dimensions. One shuffle;
    * boundaries come from Spark's range sampler, not a global sort. */
  def layout(df: DataFrame, x: Column, y: Column, nFiles: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", zkey2(x, y))
    keyed.repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
  }
}
