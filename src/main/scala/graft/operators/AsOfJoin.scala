package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward AS-OF join — for each left row, the payload of the single
  * LATEST right row whose time is ≤ the left row's time, within the
  * same key (the quotes-to-trades / last-state-at-event primitive;
  * left rows with no prior right row get nulls).
  *
  * Spark has no native ASOF JOIN, and the naive spellings are either a
  * non-equi range join (BroadcastNestedLoopJoin — quadratic work) or a
  * per-left-row greatest-time subquery (join, window, then a SECOND
  * join to fetch the payload). This is the union-and-carry-forward
  * form: tag both inputs, union them, sort within each key partition by
  * (time, side) with right rows winning ties (inclusive ≤), and carry
  * the latest right payload forward with `last(ignoreNulls)` over a
  * running frame. Cost: exactly ONE shuffle on the key plus one
  * in-partition sort — the same as a sort-merge join — independent of
  * how far back matches reach and of right-rows-per-key density.
  *
  * At 100 TB: the key shuffle is the same partitioning sessionization
  * and stateful streaming already impose; stored sorted-bucketed event
  * layouts collapse the sort to a merge pass. Ties BETWEEN right rows
  * at identical (key, time) resolve arbitrarily — pre-aggregate the
  * right side to one row per (key, time) when that matters (the q57
  * query does).
  */
object AsOfJoin {

  /** @param values right-side columns to carry onto each left row
    *               (names preserved in the output, after all left
    *               columns; callers ensure no collision) */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               values: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueStruct = struct(values.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val valueType = right.select(valueStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(0).as("__side"), leftStruct.as("__l"),
      lit(null).cast(valueType).as("__v"))
    // a null right time would sort FIRST (asc NULLS FIRST) and its
    // payload would carry forward onto left rows that predate every
    // real right row — an unparseable timestamp must mean "no match",
    // so null-time rows never enter the union
    val rTagged = right.filter(col(rightTime).isNotNull)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(leftType).as("__l"),
        valueStruct.as("__v"))
    // side DESC: a right row at exactly the left row's time precedes it
    // in the frame, making the match inclusive (rt <= lt)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__l.*") +: values.map(v => col(s"__m.$v").as(v)): _*)
  }

  /** Forward AS-OF join — for each left row, the payload of the single
    * EARLIEST right row whose time is ≥ the left row's time (the
    * next-state-after-event primitive; left rows with no later right
    * row get nulls). Same union-and-carry plan as [[backward]], with
    * the traversal reversed: sorting time DESC and carrying the last
    * seen right payload means "smallest right time ≥ mine"; right rows
    * at exactly the left time still precede it in the frame (side
    * DESC), keeping the match inclusive. Identical cost: one key
    * shuffle + one in-partition sort. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              values: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueStruct = struct(values.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val valueType = right.select(valueStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(0).as("__side"), leftStruct.as("__l"),
      lit(null).cast(valueType).as("__v"))
    val rTagged = right.filter(col(rightTime).isNotNull)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(leftType).as("__l"),
        valueStruct.as("__v"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__l.*") +: values.map(v => col(s"__m.$v").as(v)): _*)
  }

  /** NEAREST as-of join with an optional tolerance — for each left row,
    * the right row minimizing |rt − lt| within the key, ties going to
    * the BACKWARD match (the pandas `merge_asof(direction='nearest',
    * tolerance=...)` contract). Time columns must be NUMERIC (e.g.
    * epoch micros): the gap arithmetic has no meaning on raw
    * timestamps, and a numeric axis is what the backward/forward
    * carries already assume for tolerance.
    *
    * One union, one key shuffle, TWO in-partition sorted window passes
    * (ascending carry = backward candidate, descending carry = forward
    * candidate — the second window reuses the first's partitioning, so
    * no extra Exchange), then a scan-local gap compare picks the
    * winner. Output: all left columns, the matched `values` (null when
    * nothing lies within `maxGap`), and `asof_gap` = the winning
    * |rt − lt| (null on no match). */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String, values: Seq[String],
              maxGap: Option[Column] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val valueStruct = struct((col(rightTime).as("__rt") +:
      values.map(col)).toIndexedSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val valueType = right.select(valueStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(0).as("__side"), leftStruct.as("__l"),
      lit(null).cast(valueType).as("__v"))
    val rTagged = right.filter(col(rightTime).isNotNull)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(leftType).as("__l"),
        valueStruct.as("__v"))
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bGap = col("__t") - col("__b.__rt")
    val fGap = col("__f.__rt") - col("__t")
    val pickBackward = col("__b").isNotNull &&
      (col("__f").isNull || bGap <= fGap)
    val winner = when(pickBackward, col("__b")).otherwise(col("__f"))
    val winGap = when(pickBackward, bGap).otherwise(fGap)
    val inTol = maxGap.map(g => winGap <= g).getOrElse(lit(true))
    lTagged.unionByName(rTagged)
      .withColumn("__b", last(col("__v"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 0)
      .withColumn("__w", when(winner.isNotNull && inTol, winner))
      .select(col("__l.*") +:
        (values.map(v => col(s"__w.$v").as(v)) :+
          when(col("__w").isNotNull, winGap).as("asof_gap")): _*)
  }
}
