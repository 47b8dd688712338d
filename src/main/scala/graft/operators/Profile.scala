package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling: one row of statistics per column — count, nulls,
  * exact distincts, numeric min/max — the data-quality report a lake
  * operator runs before trusting a new feed (and the manual face of the
  * ANALYZE statistics the CBO consumes; sources.Stats wires those).
  *
  * ONE aggregate pass computes every column's stats together (the
  * per-column sums/distincts all ride the same scan — profiling 100
  * columns costs one read, not 100); the driver reshapes the single
  * result row into the per-column report.
  *
  * AT SCALE, `approxDistinct = true` IS THE DEFAULT TO USE: exact
  * count(DISTINCT) keeps per-column O(distinct) aggregation state and
  * Spark plans multi-column exact distincts via an Expand (one input
  * row per distinct-column — a wide table multiplies the scan), while
  * HLL state is a few KB per column at ±5 % rsd. Reach for the exact
  * form only on bounded-cardinality tables or when the report feeds an
  * exactness-sensitive consumer; HistogramsSpec pins the approx-vs-
  * exact agreement bound so the switch is a measured trade, not a
  * guess.
  */
object Profile {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    val aggCols = fields.flatMap { f =>
      val c = col(f.name)
      val numeric = f.dataType match {
        case _: NumericType => true
        case _ => false
      }
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_${f.name}"),
        (if (approxDistinct) approx_count_distinct(c) else countDistinct(c))
          .as(s"nd_${f.name}"),
        (if (numeric) min(c).cast("double") else lit(null).cast("double"))
          .as(s"min_${f.name}"),
        (if (numeric) max(c).cast("double") else lit(null).cast("double"))
          .as(s"max_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("n"), aggCols.toIndexedSeq: _*).head()
    val n = row.getLong(0)
    val out = fields.zipWithIndex.map { case (f, i) =>
      val base = 1 + i * 4
      (f.name, n,
        if (row.isNullAt(base)) 0L else row.getLong(base),
        if (row.isNullAt(base + 1)) 0L else row.getLong(base + 1),
        if (row.isNullAt(base + 2)) None else Some(row.getDouble(base + 2)),
        if (row.isNullAt(base + 3)) None else Some(row.getDouble(base + 3)))
    }.toSeq
    out.toDF("col_name", "n", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  /** Profile drift between two states of a relation (yesterday's feed vs
    * today's, pre- vs post-backfill): per-column deltas of the profile
    * statistics — the data-observability check that catches a silently
    * shrinking feed, a null explosion, or a cardinality collapse before
    * a consumer does. Columns missing from either side are reported with
    * null deltas (schema drift shows up as its own signal).
    */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = profile(before).select(col("col_name"), col("n").as("n_before"),
      col("n_nulls").as("nulls_before"), col("n_distinct").as("distinct_before"))
    val a = profile(after).select(col("col_name"), col("n").as("n_after"),
      col("n_nulls").as("nulls_after"), col("n_distinct").as("distinct_after"))
    b.join(a, Seq("col_name"), "full_outer")
      .select(col("col_name"),
        (col("n_after") - col("n_before")).as("n_delta"),
        (col("nulls_after") - col("nulls_before")).as("nulls_delta"),
        (col("distinct_after") - col("distinct_before")).as("distinct_delta"))
  }
}
