package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed anomaly detection: flag values more than `z`
  * standard deviations from their group mean — WITHOUT float math, so
  * the flags are bit-identical across engines, partitionings, and
  * re-runs (a float μ/σ pipeline can flip a borderline flag when the
  * reduction order changes; an audit that drifts between runs is
  * useless).
  *
  * The trick: scale values to fixed-point longs (×`scale`), keep only
  * the exact integer sums S = Σv and SS = Σv², and test
  *   (n·x − S)² > z²·(n·SS − S²)
  * which is (x − μ)² > z²σ² with both sides multiplied by n² — pure
  * integer arithmetic. Overflow bound: |n·x| and n·SS must stay under
  * 2⁶³ ≈ 9.2×10¹⁸ — with values scaled to ~10⁴, that holds to ~10⁹
  * rows per group; beyond that, shrink `scale` or pre-aggregate.
  *
  * Shuffle shape: one partial-aggregated groupBy on the key for (n, S,
  * SS), one co-keyed join back (broadcast when the key table is small).
  * Per-group σ is computed once, not per row.
  */
object Anomaly {

  /** Rows of `df` with `is_anomaly` flags on the fixed-point scaled
    * `valueCol` relative to its `keyCol` group. Emits the scaled value
    * and the group stats so downstream auditing is self-contained.
    * Groups with n < 2 or zero variance flag nothing (σ = 0 would flag
    * every non-mean value; a constant column is not an anomaly).
    *
    * EVERY input row survives with a definite (non-null) flag: a null
    * group key is a group like any other (null-safe join back to its
    * stats), and a null value flags `false` — it contributes nothing to
    * the group's sums (count/sum skip nulls) and cannot be an outlier.
    */
  def zscoreFlags(df: DataFrame, keyCol: String, valueCol: String,
      z: Int = 3, scale: Int = 100): DataFrame = {
    require(z >= 1 && scale >= 1, "z and scale must be >= 1")
    val v = floor(col(valueCol) * scale).cast("long")
    val scaled = df.withColumn("__v", v)
    // count(__v), not count(*): n must cover exactly the values the sums
    // cover, or a null value would deflate its group's mean
    val stats = scaled.groupBy(col(keyCol).as("__k"))
      .agg(count(col("__v")).as("n"), sum(col("__v")).as("s"),
        sum(col("__v") * col("__v")).as("ss"))
    val nVar = col("n") * col("ss") - col("s") * col("s") // n²·σ²
    scaled.join(stats, scaled(keyCol) <=> stats("__k"), "left")
      .drop("__k")
      .withColumn("is_anomaly",
        coalesce(
          col("n") >= 2 && nVar > 0 &&
            (col("n") * col("__v") - col("s")) * (col("n") * col("__v") - col("s")) >
              lit(z.toLong * z) * nVar,
          lit(false)))
      .withColumnRenamed("__v", "v_scaled")
  }

  /** Robust per-group outlier summary via median/MAD — the z-score's
    * heavy-tail-safe sibling (one fat outlier inflates σ and masks the
    * rest; the median absolute deviation doesn't move). Flags
    * |x − median| > z·1.4826·MAD, the Gaussian-consistent cutoff.
    *
    * Like [[zscoreFlags]], the borderline test is EXACT integer
    * arithmetic: values scale to longs (×`scale`), medians come from the
    * exact percentile aggregate (interpolation g = 0.5 means doubled
    * medians are integers; doubles hold them exactly below 2⁵³), and the
    * cutoff |x − med| > z·1.4826·MAD becomes
    *   10000 · 2|xs − med| > z·14826 · (4·MAD)
    * — all integers, so a flag can never flip with partitioning, merge
    * order, or engine.
    *
    * Two aggregation passes by construction (MAD needs the median
    * first); each is a partial-aggregated groupBy on the key, and the
    * per-group medians join back by broadcast. Exact percentile state is
    * O(distinct values) per group — at 100 TB swap the boundary agg for
    * the t-digest variant (Histograms.equiDepth's documented trade).
    */
  /** Robust per-group feature scaling: (x − median) / IQR — the
    * standardization that survives heavy tails (z-scaling lets one
    * outlier compress everything else toward 0). One percentile
    * aggregate per group broadcast back; the per-row map is the only
    * other work. Determinism: Spark `percentile` and DuckDB
    * `quantile_cont` interpolate identically (a6 proves bit-parity),
    * and the per-row (x − med) / iqr is two correctly-rounded IEEE ops
    * on identical operands — same everywhere — rounded to 6 decimals.
    * Zero-IQR groups scale to null (a constant feature carries no
    * signal; 0 would be a lie and ±∞ a crash).
    */
  def robustScale(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull)
    val st = vals.groupBy(col(keyCol).as("__k"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"),
        (expr(s"percentile($valueCol, 0.75)") -
          expr(s"percentile($valueCol, 0.25)")).as("__iqr"))
    vals.join(broadcast(st), vals(keyCol) === col("__k"))
      .withColumn("scaled",
        when(col("__iqr") === 0.0, lit(null).cast("double"))
          .otherwise(round((col(valueCol) - col("__med")) / col("__iqr"), 6)))
      .drop("__k", "__med", "__iqr")
  }

  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      z: Int = 3, scale: Int = 100): DataFrame = {
    require(z >= 1 && scale >= 1, "z and scale must be >= 1")
    val scaled = df
      .withColumn("__v", round(col(valueCol) * scale).cast("long"))
      .filter(col("__v").isNotNull)
    val med = scaled.groupBy(col(keyCol).as("__k"))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    // |xs − med| is an exact multiple of 0.5 (med interpolates two longs
    // at g = 0.5), so ×2 is an exact integer; same again for the MAD.
    val dev = scaled.join(broadcast(med), scaled(keyCol) <=> med("__k"))
      .withColumn("__a2", round(abs(col("__v") - col("__med")) * 2).cast("long"))
    val mad = dev.groupBy(col(keyCol).as("__k3"))
      .agg(round(expr("percentile(__a2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), dev(keyCol) <=> col("__k3"))
      .groupBy(col(keyCol))
      .agg(
        count(col("__v")).as("n"),
        round(max(col("__med")) * 2).cast("long").as("med2"),
        max(col("mad4")).as("mad4"),
        sum(when(lit(20000L) * col("__a2") >
          lit(z.toLong * 14826L) * col("mad4"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
