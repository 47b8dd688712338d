package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over event data (sweep-line family).
  *
  * The serving contract (reference README.md:125-137 — "any SQL over the
  * curated tables") implies interval questions like "how many sensors were
  * reporting concurrently": classic sweep-line, expressed relationally so
  * Catalyst plans it as two map-side projections + one shuffle.
  *
  * Scale: the sweep is a per-key window (one shuffle keyed on the
  * partition columns; within a key the running sum is a single ordered
  * pass). Keys parallelize across executors; a SINGLE globally-ordered
  * sweep over 100 TB would instead need the two-phase form (per-range
  * partial sums + broadcast carry-in offsets, the same prefix-sum shape as
  * [[Packing.packByOffset]]) — for the keyed shapes here the window is the
  * right plan and never materializes the pair blow-up a self-join would.
  */
object Intervals {

  /** Maximum number of concurrently-open intervals per key.
    *
    * Input rows are half-open intervals `[startUs, endUs)` (epoch micros).
    * Each interval contributes a +1 delta at start and a -1 at end; the
    * running sum over (time, delta) — deltas ascending, so closings apply
    * before openings at the same instant, honouring half-open semantics —
    * is the concurrency curve, and its max is the answer. Determinism:
    * ties among equal (time, delta) rows cannot change the curve's max,
    * because a block of identical deltas peaks at its block boundary
    * regardless of intra-block order.
    */
  def maxConcurrent(
      df: DataFrame,
      startUs: Column,
      endUs: Column,
      keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    // null-endpoint intervals are meaningless and would sort first,
    // corrupting the running sum — drop the whole interval up front
    val in = df.filter(startUs.isNotNull && endUs.isNotNull)
    val deltas = in.select(k :+ startUs.as("t") :+ lit(1).as("delta"): _*)
      .unionAll(in.select(k :+ endUs.as("t") :+ lit(-1).as("delta"): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("open", sum(col("delta")).over(w))
      .groupBy(keys.map(col): _*)
      .agg(max(col("open")).cast("long").as("max_concurrent"))
  }

  /** Total covered time (union length, micros) of possibly-overlapping
    * intervals per key: the sweep counts time where the open-count is
    * positive — merging overlaps without a self-join. Same plan shape as
    * [[maxConcurrent]]: one shuffle, ordered pass per key.
    */
  def coveredMicros(
      df: DataFrame,
      startUs: Column,
      endUs: Column,
      keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val in = df.filter(startUs.isNotNull && endUs.isNotNull)
    val deltas = in.select(k :+ startUs.as("t") :+ lit(1).as("delta"): _*)
      .unionAll(in.select(k :+ endUs.as("t") :+ lit(-1).as("delta"): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(keys.map(col): _*).orderBy(col("t"), col("delta"))
    deltas
      .withColumn("open", sum(col("delta")).over(w))
      .withColumn("next_t", lead(col("t"), 1).over(wLead))
      // A segment [t, next_t) is covered iff at least one interval is open.
      .filter(col("open") > 0 && col("next_t").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("next_t") - col("t")).cast("long").as("covered_us"))
  }
}
