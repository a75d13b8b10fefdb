package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) layout — multi-dimensional data skipping for the
  * stored corpus: sorting a table by the bit-interleaving of two keys
  * clusters BOTH dimensions into every file, so per-file min/max
  * statistics prune 2-D box predicates (time × tenant, shard × day)
  * that a single-column sort order can only prune on its leading key.
  * This is the lakehouse layout primitive (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) expressed as plain codegen'd column arithmetic: the
  * magic-number bit spread is five shift/mask ops per dimension, no
  * UDF, evaluated inside the write's sort.
  *
  * Keys must be non-negative and fit in 32 bits — rank/bucket skewed
  * or wide domains first (e.g. `ntile`, epoch-day, hash-mod); the
  * interleave preserves locality of whatever ordering the buckets
  * encode.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions of a
    * 64-bit value (classic Morton magic numbers). */
  private[core] def spread(x: Column): Column = {
    // x = (x | x << 16) & 0x0000FFFF0000FFFF; ... down to single bits
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    // mask FIRST: a negative int (hash-mod is the documented bucketing
    // suggestion) sign-extends under cast('long'), and unmasked sign
    // bits would silently interleave into garbage z values
    val low32 = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    masks.foldLeft(low32) { case (c, (s, m)) =>
      (c.bitwiseOR(shiftleft(c, s))).bitwiseAND(lit(m))
    }
  }

  /** The 64-bit Morton code of two non-negative 32-bit keys: bits of
    * `a` land on even positions, bits of `b` on odd. Adjacent z values
    * are adjacent in BOTH dimensions at every power-of-two granularity
    * (quadrant prefixes — see the spec's locality property). */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Quantize a non-negative integral column onto the 16-bit grid
    * given an EXCLUSIVE domain max (v·2¹⁶ div max — integer floor,
    * deterministic and oracle-replayable; max usually comes from a
    * one-row broadcast aggregate or table statistics). The bucketing
    * step the doc comment above asks for, for wide integer domains. */
  def grid16(v: Column, maxExclusive: Column): Column =
    call_function("div", v.cast("long") * lit(65536L), maxExclusive.cast("long"))

  /** Rewrite `df` in z-order on the two keys: a range-partitioned sort
    * on the z value, which the writer preserves into file order — each
    * output file then covers a compact rectangle of the key space and
    * its parquet min/max stats prune 2-D boxes. `repartitionByRange`
    * (not coalesce) keeps the sort distributed at any scale. */
  def layout(df: DataFrame, a: Column, b: Column, partitions: Int): DataFrame =
    df.withColumn("__z", zvalue(a, b))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
