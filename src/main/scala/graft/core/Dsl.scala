package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB oracle.
  * Plain `sum(double)` is addition-order-sensitive, so two engines can
  * disagree in the last ulps and flip a `ROUND(x, 2)`. Every money-like
  * aggregate therefore goes through an exact DECIMAL accumulator
  * (the inputs are 2-dp values, so the cast is lossless), is summed
  * exactly, and only then cast to DOUBLE and rounded. Both engines
  * produce bit-identical doubles on this path, and on a real cluster the
  * decimal sum is also deterministic across partition orders — a
  * correctness property worth keeping at 100 TB scale.
  */
object Dsl {
  /** Exact 2-dp decimal view of a money-like double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(15, 2))

  /** Exact 4-dp decimal view of a rate-like double column (discount/tax). */
  def dec4(c: Column): Column = c.cast(DecimalType(6, 4))

  /** Deterministic `ROUND(SUM(c), 2)` over 2-dp doubles → DOUBLE. */
  def sum2(c: Column): Column = round(sum(dec2(c)).cast("double"), 2)

  /** Deterministic `ROUND(AVG(c), 2)`: exact decimal sum ÷ count in IEEE
    * double — both engines perform the identical division. */
  def avg2(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 2)
}
