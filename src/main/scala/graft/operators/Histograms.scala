package graft.operators

import graft.functions.BinCountAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (equal-frequency) histograms: `buckets` ranges whose
  * boundaries are the 1/k … (k-1)/k quantiles of the value column —
  * built WITHOUT a global sort or an `ntile` single-partition window.
  * The boundary row is tiny (k-1 doubles), so bucket assignment is a
  * map-only pass against it and the plan is aggregate + scan at any
  * scale.
  *
  * Boundary flavors:
  *  - approx (the DEFAULT, and the at-scale choice): mergeable t-digest
  *    ([[graft.functions.TDigestAgg]]) — constant aggregation state per
  *    partition regardless of value cardinality. Rank error at the
  *    default compression is a fraction of a percent, and a bucket's
  *    depth deviates from n/k by at most the two boundary rank errors
  *    (HistogramsSpec pins the agreement bound; the `h3` registry query
  *    oracles it at sf scale).
  *  - exact (`exact = true`): [[exactQuantiles]] — a two-level
  *    histogram refinement that matches DuckDB `quantile_cont` /
  *    Spark `percentile` bit-for-bit (the `h2` registry query oracles
  *    it) but keeps CONSTANT aggregation state. Spark's own exact
  *    `percentile` holds a value→count map, O(distinct values) per
  *    partition — measured 2-3 s on 600 k near-unique doubles at
  *    sf0.1 and pathological at 100 TB; the refinement runs the same
  *    boundaries in a fraction of that with three cheap scans.
  *
  * Nulls are excluded (a null compares as null and has no rank). Output:
  * (bucket 1-based, n, lo, hi, share) where share = n / total non-null.
  */
object Histograms {

  /** EXACT quantiles (quantile_cont semantics: linear interpolation at
    * rank p·(n-1)) via histogram refinement, in three bounded passes:
    *
    *   1. min / max / count — plain codegen'd aggregate.
    *   2. [[graft.functions.BinCountAgg]]: counts per fixed-width bin
    *      over [min, max] — ONE long[bins] state per partition, no
    *      shuffle of values. The cumulative bin counts localize every
    *      target rank (⌊p·(n-1)⌋ and its successor) to one bin.
    *   3. Rows in the ≤ 2·|ps| candidate bins are re-read, collapsed to
    *      (value, count) by a tiny groupBy, and collected; exact rank
    *      walking + interpolation happen driver-side on that bounded
    *      model (expected candidate rows ≈ distinct/bins per target —
    *      guarded by `maxCandidates`, raise `bins` if it ever trips).
    *
    * All three passes are map-side-reduced aggregations — nothing here
    * is O(rows) or O(distinct) in driver or executor memory, so the
    * same plan holds on a 1000-executor cluster. Interpolation mirrors
    * Spark's Percentile.getPercentile weighted form bit-for-bit.
    *
    * Returns (boundaries, total non-null count). NaNs are EXCLUDED like
    * nulls (a NaN has no engine-portable rank: Spark's percentile sorts
    * it greatest, DuckDB's quantile_cont ignores it) — n counts neither,
    * so boundaries over NaN-bearing input equal those over the same
    * input pre-filtered (HistogramsSpec pins this).
    */
  def exactQuantiles(df: DataFrame, value: Column, ps: Seq[Double],
      bins: Int = 8192, maxCandidates: Int = 1 << 20): (Seq[Double], Long) = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"quantiles must be in [0,1]: $ps")
    val data = df.select(value.cast("double").as("__eq_v"))
      .filter(col("__eq_v").isNotNull && !isnan(col("__eq_v")))
    val head = data.agg(min("__eq_v"), max("__eq_v"), count(lit(1))).head()
    val n = head.getLong(2)
    if (n == 0L) return (Seq.fill(ps.size)(Double.NaN), 0L)
    val lo = head.getDouble(0)
    val hi = head.getDouble(1)
    if (lo == hi || n == 1L) return (Seq.fill(ps.size)(lo), n)

    val counts = data.agg(BinCountAgg.bin_counts(col("__eq_v"), lo, hi, bins))
      .head().getSeq[Long](0).toArray
    // cumBefore(b) = number of rows in bins < b, i.e. the global rank of
    // bin b's first row in the sorted order
    val cumBefore = new Array[Long](bins)
    var acc = 0L
    var b = 0
    while (b < bins) { cumBefore(b) = acc; acc += counts(b); b += 1 }

    def binOfRank(r: Long): Int = {
      var i = java.util.Arrays.binarySearch(cumBefore, r)
      if (i >= 0) { // rank is some bin's first row; skip empty bins after it
        while (i + 1 < bins && cumBefore(i + 1) == r) i += 1
        i
      } else -i - 2
    }

    val positions = ps.map(p => p * (n - 1))
    val neededRanks = positions.flatMap(pos =>
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct
    val candBins = neededRanks.map(binOfRank).distinct.sorted

    val width = (hi - lo) / bins
    // subnormal-width degenerate case: lo < hi but (hi-lo)/bins rounds to
    // 0.0. BinCountAgg's width==0 guard put EVERY row in bin 0 in pass 2,
    // so mirror that here (floor((v-lo)/0.0) would instead be Inf/NaN and
    // the two passes would disagree — pass 3 then throws on a rank
    // mapped to an "empty" bin). All rows become candidates; the
    // maxCandidates guard still bounds the collect.
    val binIdx =
      if (width == 0.0) lit(0)
      else least(greatest(
        floor((col("__eq_v") - lit(lo)) / lit(width)).cast("int"), lit(0)), lit(bins - 1))
    val cand = data.filter(binIdx.isInCollection(candBins))
      .groupBy("__eq_v").agg(count(lit(1)).as("c"))
      .limit(maxCandidates + 1).collect()
    require(cand.length <= maxCandidates,
      s"exactQuantiles: > $maxCandidates candidate values in ${candBins.size} bins; raise bins")
    // group candidates by bin (same arithmetic as the aggregate), sort
    // within, and walk ranks from each bin's known start rank
    val byBin = cand
      .map(r => (BinCountAgg.binIndex(r.getDouble(0), lo, width, bins), r.getDouble(0), r.getLong(1)))
      .groupBy(_._1)
    val rankValue: Map[Long, Double] = neededRanks.map { r =>
      val bi = binOfRank(r)
      val vs = byBin.getOrElse(bi,
        throw new IllegalStateException(s"rank $r mapped to empty bin $bi")).sortBy(_._2)
      var rank = cumBefore(bi)
      var j = 0
      while (rank + vs(j)._3 <= r) { rank += vs(j)._3; j += 1 }
      r -> vs(j)._2
    }.toMap
    val boundaries = positions.map { pos =>
      val lower = math.floor(pos).toLong
      val higher = math.ceil(pos).toLong
      val lv = rankValue(lower)
      if (higher == lower) lv
      // the exact weighted form Spark's Percentile.getPercentile uses —
      // lo + (hi-lo)*frac differs by an ulp and would break bit parity
      else (higher - pos) * lv + (pos - lower) * rankValue(higher)
    }
    (boundaries, n)
  }

  def equiDepth(df: DataFrame, value: Column, buckets: Int = 8,
      exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"equiDepth needs >= 2 buckets, got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    // nulls AND NaNs are excluded for BOTH modes: a NaN has no rank
    // (exactQuantiles skips it, the t-digest would absorb it), and
    // Spark orders NaN above every double, so unfiltered NaNs would
    // silently pile into the TOP bucket while the totals disagreed
    // between modes — shares would stop summing to 1
    val data = df.select(value.as("__ed_v"))
      .filter(col("__ed_v").isNotNull &&
        !isnan(col("__ed_v").cast("double")))
    if (exact) {
      // boundaries land driver-side as literals: bucket assignment is a
      // pure codegen'd projection, no broadcast join node at all
      val (bs, total) = exactQuantiles(df, value, ps)
      val bucket = bs.map(q => (col("__ed_v") > lit(q)).cast("long"))
        .reduce(_ + _) + lit(1L)
      data.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("__ed_v")).as("lo"),
          max(col("__ed_v")).as("hi"))
        .select(col("bucket"), col("n"), col("lo"), col("hi"),
          (col("n").cast("double") / lit(total.toDouble)).as("share"))
    } else {
      val q = graft.functions.TDigestFunctions.tdigest_quantiles(col("__ed_v"), ps)
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
}
