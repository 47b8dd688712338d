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

  /** Interval-×-interval OVERLAP JOIN via grid bucketing — the join
    * neither an equi-join nor a point-in-window range join expresses:
    * pairs (a, b) with [aStart, aEnd) ∩ [bStart, bEnd) ≠ ∅ (epoch
    * micros, half-open). The naive theta join is a cartesian; this
    * plans as ONE keyed equi-join:
    *
    *  - each interval explodes to the grid cells it touches
    *    (`bucketWidthUs` wide) — map-side,
    *  - the sides equi-join on the cell (shuffle or broadcast, AQE
    *    decides), filtered by the true overlap predicate,
    *  - each overlapping pair is kept ONLY in the first cell both
    *    intervals share — the cell of max(aStart, bStart), which any
    *    overlapping pair covers on both sides — so no distinct is ever
    *    needed: one shuffle, exactly-once pairs.
    *
    * `bucketWidthUs` trades explode fan-out (long intervals touch many
    * cells) against join selectivity (wide cells join non-overlapping
    * pairs the filter then drops); pick it near the typical interval
    * length. The fan-out is bounded by `maxBucketsPerInterval` with an
    * IN-EXPRESSION raise_error (no extra pass): a pathological interval
    * would otherwise explode the map side quietly. Null endpoints,
    * inverted/empty intervals (end ≤ start), and negative times fail
    * fast the same way — each would silently drop or corrupt pairs.
    *
    * Column names must be disjoint across the two inputs (the caller
    * projects/aliases first — the [[graft.operators.EntityResolution]]
    * join convention).
    */
  def overlapJoin(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidthUs: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidthUs > 0, "overlapJoin: bucketWidthUs must be > 0")
    require(maxBucketsPerInterval >= 1, "overlapJoin: maxBucketsPerInterval >= 1")
    val w = bucketWidthUs
    def exploded(df: DataFrame, s: String, e: String, side: String): DataFrame = {
      val sC = col(s).cast("long"); val eC = col(e).cast("long")
      val lo = expr(s"CAST($s AS BIGINT) DIV $w")
      val hi = expr(s"(CAST($e AS BIGINT) - 1) DIV $w")
      val nb = hi - lo + 1
      // both guards FOLD INTO the used expression (a pruned side column
      // would never evaluate); the invalid check comes first — a null
      // endpoint would otherwise null `nb`, skip the fan-out branch, and
      // the row would vanish silently at the explode
      val guarded = when(sC.isNull || eC.isNull || sC < 0 || eC <= sC,
        raise_error(concat(lit(s"overlapJoin: $side-side interval [$s, $e) is "),
          lit("null, negative, empty, or inverted (start "),
          coalesce(sC.cast("string"), lit("NULL")), lit(", end "),
          coalesce(eC.cast("string"), lit("NULL")),
          lit(") — filter or repair first"))))
        .when(nb > maxBucketsPerInterval,
          raise_error(concat(
            lit(s"overlapJoin: $side-side interval spans "), nb.cast("string"),
            lit(s" cells > maxBucketsPerInterval=$maxBucketsPerInterval — " +
              "widen bucketWidthUs or split the interval"))))
        .otherwise(lo)
      df.withColumn("__cell", explode(sequence(guarded, hi)))
    }
    exploded(a, aStart, aEnd, "a")
      .join(exploded(b, bStart, bEnd, "b"), "__cell")
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__cell") === greatest(
          expr(s"CAST($aStart AS BIGINT) DIV $w"),
          expr(s"CAST($bStart AS BIGINT) DIV $w")))
      .drop("__cell")
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
