package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number() OVER (ORDER BY …)` without
  * the single-reducer sort that a bare unpartitioned window costs (Spark
  * warns "No Partition Defined for Window operation" and funnels the
  * whole relation through ONE task — the canonical 100 TB scale-killer).
  *
  * Shape (same two-pass distributed prefix-sum as
  * [[Sampling.deterministicShuffle]] / [[Packing.packByOffset]]):
  * range-bucket the rows by the order column (approx-quantile boundaries
  * — the BUCKETING may be approximate, the RESULT never is: buckets are
  * range-disjoint, so bucket offsets + an in-bucket rank compose to the
  * exact global rank whatever the boundaries landed on), count rows per
  * bucket (one partial-agg shuffle, a handful of longs to the driver),
  * then add each bucket's exclusive prefix offset to a per-bucket
  * `row_number`. Equal order-values always share a bucket, so tie columns
  * resolve identically to the single-sort formulation.
  *
  * Consumers: Spearman rank correlation (stat4 — two rank assignments
  * joined per row), systematic sampling (samp10 — every k-th row of the
  * global order), any "position in corpus order" need that shuf1-style
  * hash order doesn't cover.
  */
object Rank {

  /** Every operator here buckets via an internal `__g` column that
    * `withColumn` would silently OVERWRITE on a caller column of the
    * same name, corrupting the offset join three plans downstream
    * (found live as an Integer-vs-STRING converter error) — one shared
    * fail-fast so all four entry points refuse the clash identically.
    */
  private def requireNoBucketCol(df: DataFrame, op: String): Unit =
    require(!df.columns.contains("__g"),
      s"$op: input already has a '__g' column — rename it; '__g' is " +
        "this operator's internal range-bucket name")

  /** 1-based global rank of every row under
    * ORDER BY (orderCol, tieCols…) — exact, distributed, total iff the
    * tie columns complete a total order. Null order values fail fast
    * (piggybacked on the bucket-count pass — a null has no rank, and
    * silently dropping would shift every downstream position).
    */
  def globalRank(df: DataFrame, orderCol: String, tieCols: Seq[String],
      outCol: String = "rank_pos", numPartitions: Int = 0): DataFrame = {
    requireNoBucketCol(df, "globalRank")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    // The operator is inherently multi-pass over its input (quantile
    // boundary sample, bucket-count collect, final ranked pass), so pin
    // it once — otherwise the caller's upstream lineage re-executes
    // three times. Governed by graft.materialize.mode like every other
    // multi-consumer point; a one-shot use, safe under `off`. A frame
    // the CALLER already pinned is reused as-is — re-materializing it
    // would copy every block for nothing (Materialize.isPinned).
    val base = if (Materialize.isPinned(df)) df else Materialize(df)
    // A null order value must surface as a null bucket for the fail-fast
    // below. rangeGroup degenerates to a constant bucket when parts <= 1
    // or the boundary sample is empty (e.g. ALL order values null) — the
    // explicit isNotNull guard keeps the null path out of EVERY variant,
    // not just the bucketed one.
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val countRows = grouped.groupBy("__g").agg(count(lit(1)).as("n")).collect()
    require(countRows.forall(!_.isNullAt(0)),
      s"globalRank: null values in order column '$orderCol' — filter them " +
        "explicitly first; a null has no position in the global order")
    val counts = countRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsetExpr = Packing.bucketOffsetExpr(counts, col("__g"))
    val local = Window.partitionBy("__g")
      .orderBy((col(orderCol) +: tieCols.map(col)): _*)
    grouped
      .withColumn(outCol, offsetExpr + row_number().over(local).cast("long"))
      .drop("__g")
  }

  /** INCLUSIVE running sum of `sumCol` (long) under ORDER BY `orderCol` —
    * [[globalRank]]'s weighted twin, same two-pass distributed
    * prefix-sum: range-bucket by the order column, one partial-agg
    * shuffle for the per-bucket sums (a handful of longs to the driver),
    * then per-bucket exclusive offsets + an in-bucket running-sum
    * window. No single-reducer global window at ANY cardinality — this
    * is the rank-map shape stat6 (Mann–Whitney) runs over its
    * distinct-value table, where a bare `Window.orderBy` would funnel
    * every distinct value through one task.
    *
    * `seriesCols` names columns that split the input into INDEPENDENT
    * series, each accumulating its own running sum (stat4 runs its two
    * rank maps — one per correlation axis — through ONE call this way:
    * the alternative is one full quantile-sample/count/window pass per
    * series, or a `Window.partitionBy(series)` that funnels each series
    * through one task — the same single-reducer shape with extra
    * steps). The bucket boundaries are sampled over ALL series at once
    * — within a series that is merely a finer range split, so
    * correctness is untouched; per-(series, bucket) offsets ride back
    * in one broadcast join. The offset table the driver holds is
    * O(|series| · buckets) — callers keep series cardinality bounded
    * (it is collected either way).
    *
    * Order values must be DISTINCT within a series — under ties the
    * per-row running sum depends on the tie rows' accumulation order,
    * which no total order pins down, so the output would silently vary
    * with partitioning. Like the siblings [[globalLag]]/[[globalSweep]],
    * duplicates FAIL FAST (checked per (series, bucket) on the existing
    * stats pass — equal order values within a series always share a
    * bucket, so the per-bucket check is complete); aggregate to distinct
    * order values first (stat4/stat6/ml2/ml4 all do). Null order values
    * fail fast, as in [[globalRank]]; so do null SERIES values — the
    * per-series offset equi-join could not match them (null ≠ null) and
    * the rows would otherwise vanish silently.
    *
    * `distinctOrders = true` states that the caller's table is
    * aggregated by exactly (series…, order) — a groupBy on those
    * columns built it, so a duplicate order value within a series is
    * structurally impossible. The flag skips the duplicate fail-fast's
    * `count_distinct` — NOT a free assertion: distinct-counting inside
    * a grouped aggregate plans as an Expand that doubles the rows into
    * a full-input-cardinality first-phase aggregation, measured at
    * ~0.85 s of a 594k-row pass's ~1.0 s (stat13 profile, sf0.1) —
    * while the null order/series fail-fasts stay. Callers that merely
    * BELIEVE their orders are unique (ids from upstream, file data)
    * must keep the check; the flag is for tables whose groupBy is in
    * the same expression.
    */
  def globalRunningSum(df: DataFrame, orderCol: String, sumCol: String,
      outCol: String = "run_sum", numPartitions: Int = 0,
      seriesCols: Seq[String] = Nil,
      distinctOrders: Boolean = false): DataFrame = {
    requireNoBucketCol(df, "globalRunningSum")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    // Same multi-pass shape as globalRank — pin the input once,
    // reusing a caller pin (see globalRank).
    val base = if (Materialize.isPinned(df)) df else Materialize(df)
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val keyCols = seriesCols :+ "__g"
    val statAggs = Seq(sum(col(sumCol).cast("long")).as("s"),
        count(lit(1)).as("n")) ++
      (if (distinctOrders) Nil
       else Seq(count_distinct(col(orderCol)).as("nd")))
    val sumRows = grouped.groupBy(keyCols.map(col): _*)
      .agg(statAggs.head, statAggs.tail: _*).collect()
    val gIdx = seriesCols.length
    require(sumRows.forall(!_.isNullAt(gIdx)),
      s"globalRunningSum: null values in order column '$orderCol' — filter " +
        "them explicitly first; a null has no position in the global order")
    // same duplicate-order fail-fast as globalLag/globalSweep, on the
    // same stats pass: ties make the per-row running sum depend on an
    // unspecified accumulation order — a silent partitioning dependence
    if (!distinctOrders)
      require(sumRows.forall(r => r.getLong(gIdx + 2) == r.getLong(gIdx + 3)),
        s"globalRunningSum: duplicate values in order column '$orderCol'" +
          (if (seriesCols.isEmpty) "" else s" within a (${seriesCols.mkString(", ")}) series") +
          " — the running sum at a tied row is ambiguous; aggregate to " +
          "distinct order values first")
    // a null series key would silently VANISH at the offset equi-join
    // below (null never equals null) — fail fast like the null-order
    // case instead of returning a smaller relation
    require(sumRows.forall(r => (0 until gIdx).forall(i => !r.isNullAt(i))),
      s"globalRunningSum: null values in series column(s) " +
        s"${seriesCols.mkString(", ")} — filter or coalesce them first; " +
        "the offset join would silently drop those rows")
    val local = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = sum(col(sumCol).cast("long")).over(local)
    if (seriesCols.isEmpty) {
      val sums = sumRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsetExpr = Packing.bucketOffsetExpr(sums, col("__g"))
      grouped.withColumn(outCol, offsetExpr + inBucket).drop("__g")
    } else {
      // per-series exclusive prefix offsets, shipped back as a
      // broadcast (series, bucket, offset) table — the general-key
      // sibling of bucketOffsetExpr's int-indexed array
      val spark = df.sparkSession
      val offRows = sumRows
        .groupBy(r => (0 until gIdx).map(r.get).toSeq).iterator
        .flatMap { case (_, rows) =>
          val sorted = rows.sortBy(_.getInt(gIdx))
          val offs = sorted.scanLeft(0L)((acc, r) => acc + r.getLong(gIdx + 1))
          sorted.zip(offs).map { case (r, off) =>
            // Seq[Any], NOT Seq(...): weak-lub inference would widen the
            // Int bucket id to Long and break the IntegerType schema slot
            org.apache.spark.sql.Row.fromSeq(
              (0 until gIdx).map(r.get) ++
                Seq[Any](r.getInt(gIdx), off)) }
        }.toSeq
      val offSchema = org.apache.spark.sql.types.StructType(
        seriesCols.map(c => base.schema(c)) ++ Seq(
          org.apache.spark.sql.types.StructField("__g",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("__off",
            org.apache.spark.sql.types.LongType, nullable = false)))
      val offDf = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(offRows).asJava, offSchema)
      grouped.join(broadcast(offDf), keyCols)
        .withColumn(outCol, col("__off") + inBucket)
        .drop("__g", "__off")
    }
  }

  /** Exact weighted LOWER MEDIAN per series — the `orderCol` value at
    * weighted rank (W+1) DIV 2, W = Σ weights of the series — WITHOUT
    * materializing the full running-sum map. The
    * [[globalRunningSum]]-then-`filter(cum >= (W+1) DIV 2)` formulation
    * pays a full-table window pass, a totals scan, and a join, all to
    * keep ONE row per series; but the per-(series, bucket) weight sums
    * the family's stats pass already collects locate the target rank's
    * bucket on the driver, so the window only has to run over the rows
    * of ONE bucket per series (~1/parts of the table), pruned by an
    * inner broadcast join against the (series, target bucket,
    * exclusive offset, rank, total) table. Exactness is the family
    * invariant: buckets are range-disjoint, so exclusive offset +
    * in-bucket inclusive running sum = the exact global running sum on
    * every surviving row — the selected value is identical to the
    * full-map formulation's, whatever the approximate boundaries were.
    *
    * Unlike the running-sum siblings, DUPLICATE order values need no
    * fail-fast here: a tied row's own cum is accumulation-order-
    * dependent, but the median only asks "is some row of value v at or
    * past the rank" — the LAST tied row always carries the full
    * (deterministic) group sum, so v's membership in the `cum >= rank`
    * set, and therefore min(v), is partitioning-invariant. Null order
    * values and null series values fail fast exactly as in
    * [[globalRunningSum]]. Null weights contribute nothing (SUM
    * semantics); callers feed count/multiplicity columns.
    *
    * Returns a COLLECTED LocalRelation ([[Materialize.local]]) of one
    * row per series: (seriesCols…, totalOut = W, medianOut = median) —
    * O(series) driver state, the same class as the offset table the
    * stats pass already collected. Callers broadcast-join it; it plans
    * as a LocalTableScan and broadcasts in microseconds.
    *
    * Consumers: [[graft.operators.Stats.madSummary]] (median and MAD —
    * stat13), [[graft.operators.Stats.theilSen]] (slope and intercept
    * weighted medians — stat17).
    */
  /** `rankOf` generalizes the selected order statistic: given the
    * series' total weight W it returns the 1-based target rank — the
    * default (W+1) DIV 2 is the lower median; ml15's conformal quantile
    * passes min(((W+1)·9+9) DIV 10, W) for the ceil(0.9·(n+1))-th
    * residual. A rank past the series' total weight FAILS FAST on the
    * driver walk (W > 0 only — W = 0 keeps the documented "rank 0,
    * every row qualifies, min wins" degenerate): the cum >= rank filter
    * would otherwise match nothing and the series would silently vanish
    * from the output. Everything else (bucket pruning, exactness, tie
    * invariance) is rank-agnostic.
    *
    * `pinInput = false` skips the operator's own [[Materialize]] pin for
    * callers whose input is a cheap SHUFFLE-FREE derivation of an
    * already-pinned frame (madSummary's deviation projection: a
    * broadcast join + abs() over the pinned count table) — the mba/d11
    * scale rule: re-running a map-side projection per pass costs less
    * than checkpointing a near-input-sized copy. The multi-pass
    * re-execution is then the CALLER's stated bargain.
    */
  def globalWeightedMedian(df: DataFrame, orderCol: String,
      weightCol: String, seriesCols: Seq[String] = Nil,
      totalOut: String = "total", medianOut: String = "median",
      numPartitions: Int = 0,
      rankOf: Long => Long = w => (w + 1L) / 2L,
      pinInput: Boolean = true): DataFrame = {
    requireNoBucketCol(df, "globalWeightedMedian")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    // multi-pass over the input (boundary sample, stats collect, pruned
    // windowed pass) — pin once, reusing a caller pin (see globalRank)
    val base =
      if (!pinInput || Materialize.isPinned(df)) df else Materialize(df)
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val keyCols = seriesCols :+ "__g"
    val gIdx = seriesCols.length
    val sumRows = grouped.groupBy(keyCols.map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("s")).collect()
    require(sumRows.forall(!_.isNullAt(gIdx)),
      s"globalWeightedMedian: null values in order column '$orderCol' — " +
        "filter them explicitly first; a null has no position in the " +
        "global order")
    require(sumRows.forall(r => (0 until gIdx).forall(i => !r.isNullAt(i))),
      s"globalWeightedMedian: null values in series column(s) " +
        s"${seriesCols.mkString(", ")} — filter or coalesce them first; " +
        "the target-bucket join would silently drop those rows")
    // Driver-side target-bucket selection per series: walk the buckets
    // in range order accumulating weight until the rank (W+1) DIV 2
    // falls inside one; emit (series…, bucket, exclusive offset, rank,
    // W). W = 0 degenerates to rank 0 and the FIRST bucket — the same
    // "every row qualifies, min wins" semantics the full-map filter had.
    val spark = df.sparkSession
    val tgtRows = sumRows
      .groupBy(r => (0 until gIdx).map(r.get).toSeq).iterator
      .map { case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(gIdx))
        def w(r: org.apache.spark.sql.Row): Long =
          if (r.isNullAt(gIdx + 1)) 0L else r.getLong(gIdx + 1)
        val total = sorted.map(w).sum
        val rank = rankOf(total)
        // a rank outside [1, W] would make the cum >= rank filter match
        // nothing and the series vanish silently — fail fast here, where
        // the caller's rankOf hook ran (W = 0 keeps the documented
        // degenerate: rank 0, every row qualifies, min wins)
        require(total == 0L || (rank >= 1L && rank <= total),
          s"globalWeightedMedian: rankOf returned $rank for a series of " +
            s"total weight $total — the target rank must be in [1, W]; " +
            "fix the caller's rank function")
        var off = 0L
        var i = 0
        while (i < sorted.length - 1 && off + w(sorted(i)) < rank) {
          off += w(sorted(i)); i += 1
        }
        org.apache.spark.sql.Row.fromSeq(
          (0 until gIdx).map(sorted(i).get) ++
            Seq[Any](sorted(i).getInt(gIdx), off, rank, total))
      }.toSeq
    val tgtSchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => base.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__tot",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val tgtDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(tgtRows).asJava, tgtSchema)
    val local = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // coalesce(weight, 0), NOT bare SUM: an all-null-weight series has
    // W = 0 and must hit the documented "every row qualifies, min wins"
    // degenerate — but SUM over an all-null window is NULL, so the bare
    // form made cum NULL and the filter silently dropped the series.
    // For mixed null/non-null weights SUM already skips nulls, so the
    // coalesce changes nothing there.
    val med = grouped.join(broadcast(tgtDf), keyCols)
      .withColumn("__cum",
        col("__off") +
          sum(coalesce(col(weightCol).cast("long"), lit(0L))).over(local))
      .filter(col("__cum") >= col("__rank"))
      .groupBy(seriesCols.map(col): _*)
      .agg(min(col(orderCol)).as(medianOut), first(col("__tot")).as(totalOut))
      .select((seriesCols.map(col) :+ col(totalOut) :+ col(medianOut)): _*)
    Materialize.local(med)
  }

  /** Exact BANDED weighted sum per series — Σ orderValue · keptWeight
    * over the rows whose weighted-rank span intersects the inclusive
    * rank band [loOf(W), hiOf(W)] (W = the series' total weight), with
    * partial inclusion at the two band edges: a row of weight w whose
    * inclusive cumulative rank is c spans ranks [c−w+1, c] and keeps
    * max(0, min(c, hi) − max(c−w+1, lo) + 1) units. This is the trimmed
    * mean's kept-sum (stat11: band [k+1, n−k]) generalized from the
    * full-rank-map formulation to BUCKET PRUNING: a bucket whose rank
    * span lies entirely inside the band contributes its per-bucket
    * Σ value·weight — already collected on the stats pass as an exact
    * DECIMAL(38,0) — with no window at all; only the ≤ 2 band-edge
    * buckets per series are windowed. vs the full-map form (running sum
    * over every row + totals join + corpus-sized keep aggregate) the
    * windowed work drops from the whole table to ~2/parts of it.
    *
    * Exactness: the family invariant (range-disjoint buckets, exact
    * exclusive offsets) plus integer band arithmetic — the kept sum is
    * an exact integer in DECIMAL(38,0) end to end. Ties in the order
    * column are fine for the SUM even though individual tied rows' cum
    * values are accumulation-order-dependent: keep is rank-measure
    * additive, so a tie group's total kept weight is the overlap of the
    * GROUP's (deterministic) rank span with the band, and the payload
    * multiplier (the shared order value) is constant across the group —
    * RankSpec pins partitioning invariance under heavy ties. Null
    * order/series values fail fast as in [[globalWeightedMedian]].
    *
    * Returns a COLLECTED LocalRelation of one row per series:
    * (seriesCols…, totalOut = W (long), sumOut = kept sum
    * (DECIMAL(38,0))) — O(series) driver state, like the median's.
    */
  def globalBandedSum(df: DataFrame, orderCol: String, weightCol: String,
      loOf: Long => Long, hiOf: Long => Long,
      seriesCols: Seq[String] = Nil,
      totalOut: String = "total", sumOut: String = "kept_sum",
      numPartitions: Int = 0): DataFrame = {
    requireNoBucketCol(df, "globalBandedSum")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    val base = if (Materialize.isPinned(df)) df else Materialize(df)
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val keyCols = seriesCols :+ "__g"
    val gIdx = seriesCols.length
    val sumRows = grouped.groupBy(keyCols.map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("s"),
        sum(col(orderCol).cast("decimal(38,0)") *
          col(weightCol).cast("long")).as("sv")).collect()
    require(sumRows.forall(!_.isNullAt(gIdx)),
      s"globalBandedSum: null values in order column '$orderCol' — " +
        "filter them explicitly first; a null has no position in the " +
        "global order")
    require(sumRows.forall(r => (0 until gIdx).forall(i => !r.isNullAt(i))),
      s"globalBandedSum: null values in series column(s) " +
        s"${seriesCols.mkString(", ")} — filter or coalesce them first; " +
        "the edge-bucket join would silently drop those rows")
    // Driver walk: full-band buckets sum exactly (BigDecimal of the
    // collected DECIMAL sums); buckets straddling a band edge are
    // emitted for the windowed pass with their offset and the band.
    val spark = df.sparkSession
    val fullRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val edgeRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    sumRows.groupBy(r => (0 until gIdx).map(r.get).toSeq).foreach {
      case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(gIdx))
        def w(r: org.apache.spark.sql.Row): Long =
          if (r.isNullAt(gIdx + 1)) 0L else r.getLong(gIdx + 1)
        val total = sorted.map(w).sum
        val lo = loOf(total)
        val hi = hiOf(total)
        var off = 0L
        var full = BigDecimal(0)
        sorted.foreach { r =>
          val s = w(r)
          val first = off + 1
          val last = off + s
          if (s > 0 && lo <= first && last <= hi) {
            if (!r.isNullAt(gIdx + 2))
              full += BigDecimal(r.getDecimal(gIdx + 2))
          } else if (s > 0 && first <= hi && last >= lo) {
            edgeRows += org.apache.spark.sql.Row.fromSeq(
              (0 until gIdx).map(r.get) ++
                Seq[Any](r.getInt(gIdx), off, lo, hi))
          }
          off = last
        }
        fullRows += org.apache.spark.sql.Row.fromSeq(
          (0 until gIdx).map(sorted.head.get) ++
            Seq[Any](total, new java.math.BigDecimal(
              full.underlying.stripTrailingZeros.toPlainString)))
    }
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val fullSchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => base.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField(totalOut,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__full", dec38)))
    val fullDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(fullRows.toSeq).asJava,
      fullSchema)
    val edgeSchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => base.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__lo",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__hi",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val edgeDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(edgeRows.toSeq).asJava,
      edgeSchema)
    val local = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLong = col(weightCol).cast("long")
    val edgeSums = grouped.join(broadcast(edgeDf), keyCols)
      .withColumn("__cum", col("__off") + sum(wLong).over(local))
      .withColumn("__keep", greatest(
        least(col("__cum"), col("__hi")) -
          greatest(col("__cum") - wLong + 1L, col("__lo")) + 1L, lit(0L)))
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col(orderCol).cast("decimal(38,0)") * col("__keep"))
        .as("__edge"))
    val joined =
      if (seriesCols.isEmpty) fullDf.crossJoin(edgeSums)
      else fullDf.join(edgeSums, seriesCols, "left")
    Materialize.local(joined.select(
      (seriesCols.map(col) :+ col(totalOut) :+
        (coalesce(col("__full"), lit(0).cast(dec38)) +
          coalesce(col("__edge"), lit(0).cast(dec38)))
          .cast(dec38).as(sumOut)): _*))
  }

  /** Previous row's `valueCol` under global ORDER BY `orderCol` —
    * `lag(value, 1) OVER (ORDER BY order)` without the single-reducer
    * sort, completing the distributed prefix family ([[globalRank]],
    * [[globalRunningSum]]). Same two-pass shape: range-bucket, an
    * in-bucket `lag` window, and for each bucket's FIRST row the
    * previous non-empty bucket's last value, carried back as a tiny
    * broadcast (bucket → value) table (O(buckets) driver state). The
    * global first row gets null, as `lag` would.
    *
    * Order values must be DISTINCT — "the previous row" is ambiguous
    * under ties, and a tie straddling work would silently depend on
    * partitioning — so duplicates fail fast (checked on the same
    * bucket-stats pass that collects the carry values; equal order
    * values always share a bucket, so the per-bucket check is
    * complete). Aggregate to distinct order values first (the
    * interval-sweep consumer does). Null order values fail fast as in
    * [[globalRank]].
    *
    * Consumers: interval-union coverage (ivl2 — gap length between
    * consecutive sweep boundaries), global gap detection, any
    * "difference from the previous row of the WHOLE relation" need.
    */
  /** Fusion of [[globalRunningSum]] + [[globalLag]]-of-the-order-column
    * for the sweep-line consumer: one bucketing, ONE stats collect
    * (per-bucket sum, row/distinct counts, last order value), one
    * windowed pass emitting BOTH the inclusive running sum of `sumCol`
    * (`runOut`) and the previous order value (`lagOut`). Chaining the
    * two standalone operators costs two materializations, two boundary
    * samples, two stats shuffles and two window passes over the same
    * table; a sweep needs both outputs on every row, so the fusion
    * halves the passes with identical results. Same contract as
    * [[globalLag]]: order values must be distinct and non-null (both
    * fail fast, checked on the single stats pass).
    *
    * Consumers: ivl2 (interval-union coverage: `run − delta > 0` over
    * the gap `order − prev`), global gap/idle-time detection, any
    * sweep over +1/−1 boundary deltas.
    */
  def globalSweep(df: DataFrame, orderCol: String, sumCol: String,
      runOut: String = "run_sum", lagOut: String = "prev_ord",
      numPartitions: Int = 0): DataFrame = {
    requireNoBucketCol(df, "globalSweep")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    // Multi-pass over the input (boundary sample, fused stats collect,
    // final windowed pass) — pin once, like the siblings, reusing a
    // caller pin (see globalRank).
    val base = if (Materialize.isPinned(df)) df else Materialize(df)
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val stats = grouped.groupBy("__g").agg(
      count(lit(1)).as("n"),
      count_distinct(col(orderCol)).as("nd"),
      sum(col(sumCol).cast("long")).as("s"),
      max(col(orderCol)).as("last_o"),
      count(col(sumCol)).as("nn")).collect()
    require(stats.forall(!_.isNullAt(0)),
      s"globalSweep: null values in order column '$orderCol' — filter them " +
        "explicitly first; a null has no position in the global order")
    require(stats.forall(r => r.getLong(1) == r.getLong(2)),
      s"globalSweep: duplicate values in order column '$orderCol' — the " +
        "previous row is ambiguous under ties; aggregate to distinct " +
        "order values first")
    // Same fail-fast style as the order-column checks, and on the SAME
    // stats pass: a null delta has no defined contribution to a running
    // sum (SQL SUM skips it; a +1/−1 sweep would silently drop a
    // boundary), so surface it instead of letting getLong(3) NPE on an
    // all-null bucket or nulls vanish as zeros in a mixed one.
    require(stats.forall(r => r.getLong(1) == r.getLong(5)),
      s"globalSweep: null values in sum column '$sumCol' — coalesce or " +
        "filter them explicitly first; a null delta is ambiguous in a " +
        "running sum")
    val sums = stats.map(r => r.getInt(0) -> r.getLong(3)).toMap
    val offsetExpr = Packing.bucketOffsetExpr(sums, col("__g"))
    val carryDf = carryTable(df, stats, valueIdx = 4,
      base.schema(orderCol).dataType)
    val local = Window.partitionBy("__g").orderBy(orderCol)
    val inBucket = sum(col(sumCol).cast("long"))
      .over(local.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grouped.join(broadcast(carryDf), Seq("__g"), "left")
      .withColumn(runOut, offsetExpr + inBucket)
      .withColumn(lagOut,
        when(row_number().over(local) === 1, col("__carry"))
          .otherwise(lag(col(orderCol), 1).over(local)))
      .drop("__g", "__carry")
  }

  /** The (bucket → previous non-empty bucket's value) broadcast table
    * shared by [[globalLag]] and [[globalSweep]]: given the collected
    * per-bucket stats rows (bucket id at index 0, the carried value at
    * `valueIdx`), one Row per bucket AFTER the first, holding the
    * nearest lower bucket's value (every stats row is a non-empty
    * bucket — groupBy emits observed keys only). One definition so the
    * off-by-one surface (the sorted(i−1) lookup, the i > 0 guard that
    * leaves the FIRST bucket joining to null) is decided once.
    */
  private def carryTable(df: DataFrame, stats: Array[org.apache.spark.sql.Row],
      valueIdx: Int, vType: org.apache.spark.sql.types.DataType): DataFrame = {
    val sorted = stats.sortBy(_.getInt(0))
    val rows = sorted.zipWithIndex.collect {
      case (r, i) if i > 0 =>
        org.apache.spark.sql.Row(r.getInt(0), sorted(i - 1).get(valueIdx))
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__g",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__carry", vType)))
    df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  def globalLag(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "lag_val", numPartitions: Int = 0): DataFrame = {
    requireNoBucketCol(df, "globalLag")
    val parts = math.max(1,
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism)
    // Multi-pass over the input (boundary sample, bucket stats, final
    // windowed pass) — pin once, like the siblings, reusing a caller
    // pin (see globalRank).
    val base = if (Materialize.isPinned(df)) df else Materialize(df)
    val grouped = base.withColumn("__g",
      when(col(orderCol).isNotNull, Packing.rangeGroup(base, orderCol, parts)))
    val stats = grouped.groupBy("__g").agg(
      count(lit(1)).as("n"),
      count_distinct(col(orderCol)).as("nd"),
      max_by(col(valueCol), col(orderCol)).as("last_v")).collect()
    require(stats.forall(!_.isNullAt(0)),
      s"globalLag: null values in order column '$orderCol' — filter them " +
        "explicitly first; a null has no position in the global order")
    require(stats.forall(r => r.getLong(1) == r.getLong(2)),
      s"globalLag: duplicate values in order column '$orderCol' — the " +
        "previous row is ambiguous under ties; aggregate to distinct " +
        "order values first")
    val carryDf = carryTable(df, stats, valueIdx = 3,
      base.schema(valueCol).dataType)
    val local = Window.partitionBy("__g").orderBy(orderCol)
    grouped.join(broadcast(carryDf), Seq("__g"), "left")
      .withColumn(outCol,
        when(row_number().over(local) === 1, col("__carry"))
          .otherwise(lag(col(valueCol), 1).over(local)))
      .drop("__g", "__carry")
  }
}
