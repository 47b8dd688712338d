package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (equal-frequency) histograms: `buckets` ranges whose
  * boundaries are the 1/k … (k-1)/k quantiles of the value column —
  * built WITHOUT a global sort or an `ntile` single-partition window.
  * ONE quantile aggregate produces the boundary row, which broadcasts
  * against the scan for a map-only bucket assignment, so the plan is
  * aggregate + broadcast + scan at any scale.
  *
  * Boundary flavors:
  *  - approx (the DEFAULT, and the at-scale choice): mergeable t-digest
  *    ([[graft.functions.TDigestAgg]]) — constant aggregation state per
  *    partition regardless of value cardinality. Rank error at the
  *    default compression is a fraction of a percent, and a bucket's
  *    depth deviates from n/k by at most the two boundary rank errors
  *    (HistogramsSpec pins the agreement bound; the `h3` registry query
  *    oracles it at sf scale).
  *  - exact (`exact = true`): Spark `percentile`, bit-identical to
  *    DuckDB `quantile_cont` (a6-proven) — but its aggregation state is
  *    O(distinct values). Affordable when the domain is bounded (e.g.
  *    2-decimal prices, as in `h2`); pathological on high-cardinality
  *    doubles at 100 TB, which is why approx is the default.
  *
  * Nulls are excluded (a null compares as null and has no rank). Output:
  * (bucket 1-based, n, lo, hi, share) where share = n / total non-null.
  */
object Histograms {

  def equiDepth(df: DataFrame, value: Column, buckets: Int = 8,
      exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"equiDepth needs >= 2 buckets, got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val data = df.select(value.as("__ed_v")).filter(col("__ed_v").isNotNull)
    val q =
      if (exact) expr(s"percentile(__ed_v, array(${ps.mkString("D,")}D))")
      else graft.functions.TDigestFunctions.tdigest_quantiles(col("__ed_v"), ps)
    val qsRow = data.agg(q.as("qs"), count(lit(1)).as("__ed_total"))
    val bucket = ps.indices
      .map(i => (col("__ed_v") > element_at(col("qs"), i + 1)).cast("long"))
      .reduce(_ + _) + lit(1L)
    data.crossJoin(broadcast(qsRow))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__ed_v")).as("lo"),
        max(col("__ed_v")).as("hi"), first(col("__ed_total")).as("__ed_total"))
      .select(col("bucket"), col("n"), col("lo"), col("hi"),
        (col("n").cast("double") / col("__ed_total")).as("share"))
  }
}
