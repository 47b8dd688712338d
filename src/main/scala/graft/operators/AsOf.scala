package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the latest right row with the
  * same key and right.ts <= left.ts. Spark has no native operator; the
  * naive formulation (theta join on `r.ts <= l.ts` + argmax) explodes to a
  * per-row range scan. This implementation is the scalable
  * union/carry-forward pattern:
  *
  *   1. tag both sides, union (no join!),
  *   2. ONE shuffle on the key, sort by (ts, right-before-left, tiebreak),
  *   3. last_value(..., ignoreNulls) carries each right row's payload
  *      forward to every following left row,
  *   4. keep left rows.
  *
  * Cost: one exchange + per-partition sort over |L|+|R| — the same price
  * as a sort-merge join, with no pair blow-up regardless of key skew or
  * time-range density. Ties (right.ts == left.ts) match (<= semantics);
  * among equal-ts right rows the largest tiebreak wins deterministically.
  */
object AsOf {

  /** @param left       left relation
    * @param right      right relation
    * @param leftKey    join key column in `left`
    * @param rightKey   join key column in `right`
    * @param leftTs     left ordering column (numeric or timestamp)
    * @param rightTs    right ordering column (same comparable type)
    * @param payload    right columns to carry onto matching left rows
    *                   (emitted under the same names, null when no match)
    * @param tiebreak   right column ordering equal-ts right rows (larger wins)
    */
  def joinBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: Column, rightTs: Column,
      payload: Seq[String], tiebreak: Column): DataFrame = {

    val leftCols = left.columns
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    // payload travels as ONE struct so the carry-forward is atomic — per-
    // column last(ignoreNulls) could mix fields from different right rows
    val r = right.select(
      Seq(col(rightKey).as("__k"), rightTs.as("__ts"), lit(1).as("__isR"),
        tiebreak.as("__tb"), struct(payload.map(col): _*).as("__p"))
        ++ leftCols.map(c => lit(null).as(s"__l_$c")): _*)
    val l = left.select(
      Seq(col(leftKey).as("__k"), leftTs.as("__ts"), lit(0).as("__isR"),
        lit(null).as("__tb"), lit(null).cast(payloadType).as("__p"))
        ++ leftCols.map(c => col(c).as(s"__l_$c")): _*)

    // rights sort before lefts at equal ts (so <= matches); among equal-ts
    // rights the largest tiebreak lands last and wins the carry-forward
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__isR").desc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__carry.$c").as(c)): _*)
  }
}
