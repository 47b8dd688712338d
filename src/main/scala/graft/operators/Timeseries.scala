package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequential per-key time-series transforms. These are the operators a
  * windowed formulation CANNOT express: each output depends on the
  * previous OUTPUT, not a fixed input frame, so the scan must walk each
  * key's rows in order carrying state.
  *
  * The scale-right shape is a SECONDARY SORT, not per-group buffering:
  * repartition by key, sortWithinPartitions(key, ts, id), then ONE
  * sequential pass per partition that resets state at key boundaries.
  * Memory is O(1) per partition regardless of how many rows a key has —
  * `groupByKey.flatMapGroups` would buffer a whole key in heap, which a
  * hot sensor at 100 TB overflows. One shuffle, same as any keyed op.
  */
object Timeseries {

  /** Fixed-point exponential moving average per key, α = 1/alphaDen:
    *   e₁ = x₁;  eₜ = (xₜ + (alphaDen−1)·eₜ₋₁) div alphaDen
    * over values scaled to longs (×`scale`) — all integer arithmetic
    * (truncating division, matching SQL's), so the smoothed series is a
    * pure function of the ordered inputs: partitioning, engine, and
    * re-runs cannot move it, and a recursive-CTE oracle can replay it
    * row for row. Nulls in ANY of key/ts/id/value — including a ts that
    * fails the timestamp cast or an id that fails the long cast — are
    * dropped by the same filter (a null has no place in a recurrence,
    * and a half-null tuple would NPE the primitive encoder; an
    * audit-friendly variant would carry them forward unsmoothed).
    *
    * Output: (key, id, v_scaled, ewma_scaled), one row per input row.
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, alphaDen: Int = 4,
      scale: Int = 100): DataFrame = {
    require(alphaDen >= 2, "alphaDen must be >= 2 (alpha = 1/alphaDen)")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared: Dataset[(Long, Long, Long, Long)] = df
      .select(col(keyCol).cast("long").as("__k"),
        unix_micros(col(tsCol).cast("timestamp")).as("__t"),
        col(idCol).cast("long").as("__id"),
        round(col(valueCol) * scale).cast("long").as("__xs"))
      .filter(col("__k").isNotNull && col("__t").isNotNull &&
        col("__id").isNotNull && col("__xs").isNotNull)
      .repartition(col("__k"))
      .sortWithinPartitions("__k", "__t", "__id")
      .as[(Long, Long, Long, Long)]
    val den = alphaDen.toLong
    prepared
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var hasKey = false
        var e = 0L
        rows.map { case (k, _, id, xs) =>
          if (!hasKey || k != curKey) { curKey = k; hasKey = true; e = xs }
          else e = (xs + (den - 1L) * e) / den
          (k, id, xs, e)
        }
      }
      .toDF(keyCol, idCol, "v_scaled", "ewma_scaled")
  }
}
