package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics over integer-valued metrics —
  * the drift detectors a data pipeline runs between cohorts, time
  * windows, or dataset versions before trusting that "same pipeline,
  * same distribution" still holds (reference analog: the ad-hoc
  * Athena comparisons a curated-zone consumer runs by hand,
  * README.md:128-133 — here as exact, engine-portable statistics).
  */
object Stats {

  /** Fail-fast long projection shared by every value/difference column
    * here: nulls AND non-integral values raise naming the operator and
    * column — a bare `cast("long")` silently truncates 3.5 → 3,
    * misquantizing the statistic (the same hazard class the round-14
    * side-column domain fix closed; callers pre-quantize, cents-style,
    * exactly as the board queries do). The check is value-level, not
    * type-level: an integral double/decimal (3.0) passes.
    */
  private def integralOf(op: String, c: String,
      role: String = "value"): Column =
    when(col(c).isNull, raise_error(lit(
        s"$op: null $role in '$c' — filter or impute first")))
      .when(col(c) =!= col(c).cast("long"), raise_error(concat(
        lit(s"$op: non-integral $role in '$c' — quantize first " +
          "(cents), got "), col(c).cast("string"))))
      .otherwise(col(c).cast("long"))

  /** Two-sample Kolmogorov–Smirnov distance, EXACT: D = max over the
    * merged support of |F_a(v) − F_b(v)|, computed entirely in integer
    * arithmetic — the per-value statistic is |cum_a·n_b − cum_b·n_a|
    * (the ECDF difference cross-multiplied to clear both denominators,
    * DECIMAL(38,0) so no achievable count wraps it), so the argmax and
    * the reported distance are bit-identical on any engine and under
    * any partitioning. No float ECDFs, no approximation.
    *
    * Scale shape (the stat11 discipline): one partial-aggregated pass
    * melts the corpus to the O(distinct value) per-value count table —
    * both cohorts' counts ride the SAME row, zeros included, which is
    * what keeps the two running ECDFs aligned at values one side never
    * saw; per-side running counts ride ONE multi-series
    * [[Rank.globalRunningSum]] (never a single-task global window); the
    * final max is an ordinary aggregate with the (−value) struct-extreme
    * tie-break (lowest value achieving the max — a total order). Totals
    * come from their own 2-column scan — the measured-cheaper pattern
    * stat11/ml15 document.
    *
    * Output (one row): n_a, n_b, ks_x1e9 = max|·|·10⁹ DIV (n_a·n_b)
    * (truncating; numerator ≥ 0 so DIV == floor == an oracle's //; the
    * quotient is ≤ 10⁹ at ANY count, so the emitted long can never
    * overflow — the raw cross-multiplied max is deliberately NOT
    * emitted, it exceeds a long once n_a·n_b passes ~9·10¹⁸), and
    * at_value = the smallest value attaining the max.
    * Fail-fasts: null/out-of-domain side codes, null values, and
    * NON-INTEGRAL values raise with the column named (a bare long cast
    * would silently truncate 3.5 → 3 and misquantize the statistic —
    * the same hazard class the side-column domain check closed;
    * callers quantize first, cents-style, as the board queries do); an
    * EMPTY cohort raises (one-sided data makes D degenerate 1.0 — a
    * comparison that never compared would wear a statistic's label).
    */
  def ksTwoSample(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    // domain check on the RAW value, before any cast: casting first would
    // truncate a fractional side (0.9 → 0) into a silently-misassigned
    // cohort instead of the promised fail-fast
    val side = when(col(sideCol).isNull ||
        (col(sideCol) =!= lit(0) && col(sideCol) =!= lit(1)),
      raise_error(concat(lit(s"ksTwoSample: side column '$sideCol' must " +
        "be 0/1, got "), coalesce(col(sideCol).cast("string"), lit("NULL")))))
      .otherwise(col(sideCol).cast("long"))
    val v = integralOf("ksTwoSample", valueCol)
    val base = df.select(side.as("__s"), v.as("__v"))
    val cnt = base.groupBy("__v").agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__cb"))
    // melt to (value, series, count) with BOTH series present at every
    // distinct value — zero counts are load-bearing: they are how a
    // side's ECDF stays readable at values only the other side took
    val melted = cnt.select(col("__v"), explode(array(
        struct(lit(0L).as("__series"), col("__ca").as("__c")),
        struct(lit(1L).as("__series"), col("__cb").as("__c")))).as("__z"))
      .select(col("__v"), col("__z.__series").as("__series"),
        col("__z.__c").as("__c"))
    val rm = Rank.globalRunningSum(melted, "__v", "__c", outCol = "__cum",
      seriesCols = Seq("__series"), distinctOrders = true)
    val pairs = rm.groupBy("__v").agg(
      max(when(col("__series") === 0L, col("__cum"))).as("__cuma"),
      max(when(col("__series") === 1L, col("__cum"))).as("__cumb"))
    val tot = base.groupBy().agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__na"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__nb"))
    pairs.crossJoin(broadcast(tot))
      .select(col("__v"), col("__na"), col("__nb"),
        abs(expr("CAST(__cuma AS DECIMAL(38,0)) * __nb - " +
          "CAST(__cumb AS DECIMAL(38,0)) * __na")).as("__num"))
      .agg(max(struct(col("__num"), (-col("__v")).as("__negv"))).as("__m"),
        max(col("__na")).as("__na"), max(col("__nb")).as("__nb"))
      .select(
        when(col("__na").isNull || col("__na") === 0L ||
            col("__nb") === 0L, raise_error(lit(
          "ksTwoSample: a cohort is empty — D degenerates to 1.0; " +
            "check the side predicate")))
          .otherwise(col("__na")).as("n_a"),
        col("__nb").as("n_b"),
        expr("CAST(__m.__num * 1000000000 DIV " +
          "(CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)").as("ks_x1e9"),
        (-col("__m.__negv")).as("at_value"))
  }

  /** Two-sample Cramér–von Mises criterion, EXACT (Anderson 1962, "On
    * the distribution of the two-sample Cramér–von Mises criterion"):
    * T = n_a·n_b/N² · Σ over ALL pooled observations of
    * (F_a(x) − F_b(x))² — [[ksTwoSample]]'s body-sensitive sibling: KS
    * reads only the single worst ECDF gap (tail-dominated), CvM
    * integrates the squared gap over the whole distribution, catching
    * a broad mid-distribution shift KS underweights.
    *
    * Exactness: at each distinct value the cross-multiplied gap
    * D = cum_a·n_b − cum_b·n_a is an integer (stat12's device), so
    * Σ c_v·D_v² is an exact integer in DECIMAL(38,0) (≤ N·(n_a·n_b)²
    * ≈ 10²⁸ at 600k rows; DuckDB replays in HUGEINT), and T·10⁹ =
    * Σ·10⁹ DIV (n_a·n_b·N²) is a truncating integer division both
    * engines state identically (numerator non-negative, DIV == floor
    * == //). Nothing float anywhere.
    *
    * SCALE CEILING, stated honestly (round-15 advisory): the naive
    * final step Σ·10⁹ would wrap DECIMAL(38,0) at only ~1.3M pooled
    * rows (Σ grows ~N⁵/16, and ×10⁹ spends 9 of the 38 digits), so the
    * division runs as the exact Euclidean split q·10⁹ + (r·10⁹) DIV d
    * with q = Σ DIV d, r = Σ % d (identical value: Σ = q·d + r ⇒
    * Σ·10⁹ DIV d = q·10⁹ + r·10⁹ DIV d, every term non-negative). Now
    * q ≤ N/4 (the criterion's own bound) and r·10⁹ < d·10⁹ ≈ N⁴/4·10⁹,
    * so the binding constraint is Σ itself: the operator is exact to
    * ~4·10⁷ pooled rows — the inherent DECIMAL(38,0) price of an exact
    * integer CvM — and a genuine overflow past that RAISES (ANSI)
    * rather than rounding. The oracle needs no split: the value is
    * identical and HUGEINT holds the naive form at oracle scales.
    *
    * Scale shape: IDENTICAL to stat12 — one partial-aggregated melt to
    * the O(distinct value) per-value count table with BOTH cohorts'
    * counts on the same row (zeros load-bearing), ONE multi-series
    * [[Rank.globalRunningSum]], one final aggregate. Same fail-fasts:
    * raw-value 0/1 side domain, null values, empty cohort.
    *
    * Output (one row): n_a, n_b, cvm_x1e9 (≤ N/4·10⁹ — fits a long at
    * any feasible N).
    */
  def cvmTwoSample(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val side = when(col(sideCol).isNull ||
        (col(sideCol) =!= lit(0) && col(sideCol) =!= lit(1)),
      raise_error(concat(lit(s"cvmTwoSample: side column '$sideCol' must " +
        "be 0/1, got "), coalesce(col(sideCol).cast("string"), lit("NULL")))))
      .otherwise(col(sideCol).cast("long"))
    val v = integralOf("cvmTwoSample", valueCol)
    val base = df.select(side.as("__s"), v.as("__v"))
    val cnt = base.groupBy("__v").agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__cb"))
    val melted = cnt.select(col("__v"), explode(array(
        struct(lit(0L).as("__series"), col("__ca").as("__c")),
        struct(lit(1L).as("__series"), col("__cb").as("__c")))).as("__z"))
      .select(col("__v"), col("__z.__series").as("__series"),
        col("__z.__c").as("__c"))
    val rm = Rank.globalRunningSum(melted, "__v", "__c", outCol = "__cum",
      seriesCols = Seq("__series"), distinctOrders = true)
    val pairs = rm.groupBy("__v").agg(
      max(when(col("__series") === 0L, col("__cum"))).as("__cuma"),
      max(when(col("__series") === 1L, col("__cum"))).as("__cumb"),
      // c_v = the pooled multiplicity at this value (both series' counts
      // ride the same melted rows, so their sum is exactly ca + cb)
      sum(col("__c")).as("__cv"))
    val tot = base.groupBy().agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__na"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__nb"))
    pairs.crossJoin(broadcast(tot))
      .select(col("__na"), col("__nb"),
        // c_v · D_v² in DECIMAL(38,0): D ≤ n_a·n_b ≈ 10¹¹ at sf-scale,
        // D² ≤ 10²², the weighted term ≤ 10²⁸ — exact, and a genuine
        // overflow RAISES rather than rounds
        expr("""CAST(__cv AS DECIMAL(38,0)) *
          (CAST(__cuma AS DECIMAL(38,0)) * __nb - CAST(__cumb AS DECIMAL(38,0)) * __na) *
          (CAST(__cuma AS DECIMAL(38,0)) * __nb - CAST(__cumb AS DECIMAL(38,0)) * __na)""")
          .as("__w"))
      .agg(sum(col("__w")).as("__sum"),
        max(col("__na")).as("__na"), max(col("__nb")).as("__nb"))
      .withColumn("__den", expr("""CAST(__na AS DECIMAL(38,0)) * __nb *
        (CAST(__na AS DECIMAL(38,0)) + __nb) *
        (CAST(__na AS DECIMAL(38,0)) + __nb)"""))
      .select(
        when(col("__na").isNull || col("__na") === 0L ||
            col("__nb") === 0L, raise_error(lit(
          "cvmTwoSample: a cohort is empty — the criterion is " +
            "degenerate; check the side predicate")))
          .otherwise(col("__na")).as("n_a"),
        col("__nb").as("n_b"),
        // Euclidean split (see the SCALE CEILING doc note): q·10⁹ +
        // (r·10⁹) DIV d == Σ·10⁹ DIV d exactly, but never materializes
        // Σ·10⁹ — the ×10⁹ now touches only r < d, so the ceiling is
        // Σ's own DECIMAL(38,0) bound (~4·10⁷ pooled rows), not ~1.3M
        expr("""CAST((__sum DIV __den) * 1000000000 +
          ((__sum % __den) * 1000000000) DIV __den AS BIGINT)""")
          .as("cvm_x1e9"))
  }

  /** Two-sample Anderson–Darling criterion, tie-adjusted
    * (Scholz–Stephens 1987, "K-sample Anderson–Darling tests", k = 2),
    * ENGINE-EXACT procedure: completes the ECDF-drift trio — KS reads
    * the single worst gap (stat12), CvM integrates the squared gap
    * uniformly (stat16), AD reweights it by 1/(H(1−H)) so TAIL
    * deviations count — the detector that fires when two cohorts agree
    * in the middle but one has grown a heavy tail.
    *
    * Integer device: the discrete-data statistic uses midranks, which
    * are half-integers — so everything rides ×2 (stat14's trick):
    * B2_j = 2·S_j − l_j (pooled), M2_ij = 2·cum_ij − l_ij (per side),
    * and the ×4-cleared denominator D4_j = B2_j·(2N − B2_j) − N·l_j
    * is a plain long (the /4s cancel against the squared /2s exactly).
    * Per (side, value) the term l_j·u², u = N·M2_ij − n_i·B2_j, is an
    * exact DECIMAL(38,0); each term is floor-quantized ONCE at ×10⁹
    * via the cvm Euclidean split (q·10⁹ + r·10⁹ DIV d — never
    * materializing term·10⁹, so the ceiling is the term's own bound,
    * ~4·10⁷ pooled rows like stat16), then summed as exact integers —
    * float summation order never exists, and DuckDB replays the
    * identical floors. Output ad_x1e9 ≈ A²·10⁹ with
    * A² = (N−1)/N² · Σ_i (1/n_i) Σ_j l_j·u²/D4_j; the deterministic
    * per-term floor under-counts by < m·2/10⁹ of a unit (m = distinct
    * values) — a stated quantization, not a float artifact.
    *
    * Scale shape: IDENTICAL to stat12/stat16 — one partial-aggregated
    * melt to the O(distinct value) count table (both cohorts' counts
    * and zeros on the same row), ONE multi-series
    * [[Rank.globalRunningSum]], one final aggregate. Fail-fasts: side
    * domain, null/non-integral values, empty cohort, and a CONSTANT
    * pooled sample (one distinct value — D4 = 0 and the weight is
    * undefined; a comparison over no variation would wear the
    * statistic's label).
    */
  def adTwoSample(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val side = when(col(sideCol).isNull ||
        (col(sideCol) =!= lit(0) && col(sideCol) =!= lit(1)),
      raise_error(concat(lit(s"adTwoSample: side column '$sideCol' must " +
        "be 0/1, got "), coalesce(col(sideCol).cast("string"), lit("NULL")))))
      .otherwise(col(sideCol).cast("long"))
    val v = integralOf("adTwoSample", valueCol)
    val base = df.select(side.as("__s"), v.as("__v"))
    val cnt = base.groupBy("__v").agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__cb"))
    val melted = cnt.select(col("__v"), explode(array(
        struct(lit(0L).as("__series"), col("__ca").as("__c")),
        struct(lit(1L).as("__series"), col("__cb").as("__c")))).as("__z"))
      .select(col("__v"), col("__z.__series").as("__series"),
        col("__z.__c").as("__c"))
    val rm = Rank.globalRunningSum(melted, "__v", "__c", outCol = "__cum",
      seriesCols = Seq("__series"), distinctOrders = true)
    val pairs = rm.groupBy("__v").agg(
      max(when(col("__series") === 0L, col("__cum"))).as("__cuma"),
      max(when(col("__series") === 1L, col("__cum"))).as("__cumb"),
      max(when(col("__series") === 0L, col("__c"))).as("__la"),
      max(when(col("__series") === 1L, col("__c"))).as("__lb"))
    val tot = base.groupBy().agg(
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("__na"),
      sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("__nb"),
      count(lit(1)).as("__nn"))
    // per-value ×2 midrank quantities, then one quantized term per side
    val terms = pairs.crossJoin(broadcast(tot))
      .withColumn("__l", col("__la") + col("__lb"))
      .withColumn("__b2",
        lit(2L) * (col("__cuma") + col("__cumb")) - col("__l"))
      .withColumn("__d4",
        col("__b2") * (lit(2L) * col("__nn") - col("__b2")) -
          col("__nn") * col("__l"))
      .withColumn("__m2a", lit(2L) * col("__cuma") - col("__la"))
      .withColumn("__m2b", lit(2L) * col("__cumb") - col("__lb"))
      .withColumn("__ua", expr(
        "CAST(__nn AS DECIMAL(38,0)) * __m2a - CAST(__na AS DECIMAL(38,0)) * __b2"))
      .withColumn("__ub", expr(
        "CAST(__nn AS DECIMAL(38,0)) * __m2b - CAST(__nb AS DECIMAL(38,0)) * __b2"))
      // Euclidean-split ×10⁹ floor per term (see scaladoc): exact, and
      // never materializes term·10⁹. D4 = 0 only in the constant-
      // pooled-sample degenerate (provable: D4 = x(2N−x) − N·l with
      // x = 2S−l ∈ [l, 2N−l] is minimized at the endpoints where it
      // equals l(N−l), zero only at l = N) — guarded here so the
      // operator's OWN fail-fast below names the problem instead of a
      // bare ANSI divide-by-zero
      .withColumn("__ta", expr("""CASE WHEN __d4 > 0 AND __na > 0 AND __nb > 0 THEN
        (CAST(__l AS DECIMAL(38,0)) * __ua * __ua DIV (CAST(__d4 AS DECIMAL(38,0)) * __na)) * 1000000000 +
        ((CAST(__l AS DECIMAL(38,0)) * __ua * __ua % (CAST(__d4 AS DECIMAL(38,0)) * __na)) * 1000000000)
          DIV (CAST(__d4 AS DECIMAL(38,0)) * __na) ELSE 0 END"""))
      .withColumn("__tb", expr("""CASE WHEN __d4 > 0 AND __na > 0 AND __nb > 0 THEN
        (CAST(__l AS DECIMAL(38,0)) * __ub * __ub DIV (CAST(__d4 AS DECIMAL(38,0)) * __nb)) * 1000000000 +
        ((CAST(__l AS DECIMAL(38,0)) * __ub * __ub % (CAST(__d4 AS DECIMAL(38,0)) * __nb)) * 1000000000)
          DIV (CAST(__d4 AS DECIMAL(38,0)) * __nb) ELSE 0 END"""))
    terms
      .agg(sum(expr("CAST(__ta AS DECIMAL(38,0)) + __tb")).as("__t"),
        max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        max(col("__nn")).as("__nn"), count(lit(1)).as("__m"))
      .select(
        when(col("__na").isNull || col("__na") === 0L ||
            col("__nb") === 0L, raise_error(lit(
          "adTwoSample: a cohort is empty — the criterion is " +
            "degenerate; check the side predicate")))
          .otherwise(col("__na")).as("n_a"),
        when(col("__m") <= 1L, raise_error(lit(
          "adTwoSample: the pooled sample is constant — the AD weight " +
            "1/(H(1-H)) is undefined; feed a varying value column")))
          .otherwise(col("__nb")).as("n_b"),
        expr("""CAST((CAST(__nn AS DECIMAL(38,0)) - 1) * __t DIV
          (CAST(__nn AS DECIMAL(38,0)) * __nn) AS BIGINT)""").as("ad_x1e9"))
  }

  /** Kendall rank correlation τ-b, EXACT pair counts (Kendall 1938;
    * the τ-b tie correction is Kendall 1945): completes the rank-
    * correlation family next to stat4's Spearman — τ counts pair
    * AGREEMENTS (concordant minus discordant), so it is the statistic
    * consumers reach for when the question is "how often does ranking
    * by x agree with ranking by y", and it is robust to any monotone
    * transform of either axis.
    *
    * Everything but the final ratio is integer arithmetic: concordant
    * P, discordant Q, tie terms T_x/T_y, and n ride exact longs;
    * τ_b = (P − Q) / √((n₀−T_x)(n₀−T_y)) is then three IEEE ops on
    * exactly-representable integers (each ≤ n²/2 < 2⁵³ for any corpus
    * a single statistic would be read over), so the emitted double is
    * bit-identical on any engine that states the same op order — the
    * oracle does.
    *
    * Scale shape (the stat5 bounded-grid discipline): ONE partial-
    * aggregated pass melts the corpus to the O(distinct (x, y)) cell
    * table, pinned once; P and Q come from a single broadcast
    * cell×cell dominance join (x_b > x_a, strict y compare picks the
    * side — each unordered pair counted exactly once), tie terms from
    * the cell marginals. The join is O(cells²), so the operator
    * REQUIRES a bounded domain — ≤ 4096 distinct cells, checked, the
    * contract stat5's chi-square grid documents — quantize first
    * (bucket continuous values) exactly as for a contingency table;
    * the corpus itself is never self-joined. Nulls fail fast naming
    * the column; a constant axis raises (τ undefined, n₀ = T).
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(integralOf("kendallTauB", xCol).as("__x"),
      integralOf("kendallTauB", yCol).as("__y"))
    val cells = Materialize(
      rows.groupBy("__x", "__y").agg(count(lit(1)).as("__c")))
    val nCells = cells.count()
    require(nCells <= 4096L,
      s"kendallTauB: $nCells distinct (x, y) cells — the dominance join " +
        "is O(cells²); quantize/bucket the axes first (the contingency-" +
        "table contract)")
    val a = cells.select(col("__x").as("__ax"), col("__y").as("__ay"),
      col("__c").as("__ca"))
    val b = cells.select(col("__x").as("__bx"), col("__y").as("__by"),
      col("__c").as("__cb"))
    val pq = a.join(broadcast(b), col("__bx") > col("__ax"))
      .agg(
        coalesce(sum(when(col("__by") > col("__ay"),
          col("__ca") * col("__cb")).otherwise(0L)), lit(0L)).as("__p"),
        coalesce(sum(when(col("__by") < col("__ay"),
          col("__ca") * col("__cb")).otherwise(0L)), lit(0L)).as("__q"))
    val tx = cells.groupBy("__x").agg(sum(col("__c")).as("__m"))
      .agg(sum(expr("__m * (__m - 1) DIV 2")).as("__tx"))
    val ty = cells.groupBy("__y").agg(sum(col("__c")).as("__m"))
      .agg(sum(expr("__m * (__m - 1) DIV 2")).as("__ty"))
    val n = rows.groupBy().agg(count(lit(1)).as("__n"))
    pq.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(n))
      .select(col("__n").as("n"), col("__p").as("concordant"),
        col("__q").as("discordant"), col("__tx").as("ties_x"),
        col("__ty").as("ties_y"),
        expr("__n * (__n - 1) DIV 2").as("__n0"),
        col("__p"), col("__q"), col("__tx"), col("__ty"))
      .select(col("n"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"),
        when(col("__n0") === col("__tx") || col("__n0") === col("__ty"),
          raise_error(lit("kendallTauB: an axis is constant — every " +
            "pair is tied and τ-b is undefined (n0 == T); feed two " +
            "varying columns")))
          .otherwise(round(
            (col("__p") - col("__q")).cast("double") /
              sqrt((col("__n0") - col("__tx")).cast("double") *
                (col("__n0") - col("__ty")).cast("double")), 6))
          .as("tau_b"))
  }

  /** Per-group MEDIAN / MAD / robust-outlier summary, EXACT: the
    * median is the true ((n+1) DIV 2)-th order statistic (lower
    * median — a value FROM the data, no interpolation), the MAD is the
    * same order statistic of |x − median|, and `outliers_n` counts
    * rows with |x − median| > k·MAD (Hampel's rule; k = 5 by default,
    * deliberately conservative for data curation). Every step is
    * integer arithmetic over integer values, so the summary is
    * engine- and partitioning-exact — the robust location/scale pair a
    * curation pipeline uses where mean/stddev would be owned by the
    * very outliers it is hunting.
    *
    * Scale shape (the stat11/trimmed-mean discipline): ONE
    * partial-aggregated pass melts the corpus to the O(distinct
    * (group, value)) count table, PINNED once (three consumers read
    * it); the median and the MAD are each ONE bucket-pruned
    * [[Rank.globalWeightedMedian]] (boundary sample + per-(group,
    * bucket) stats collect + a window over ONLY the target bucket —
    * never a full-table window), the MAD's over the deviation-count
    * table (derived from the pinned counts by a broadcast join — the
    * corpus is never rescanned, and the table is itself pinned for its
    * two consumers); group totals ride the medians' stats passes, so
    * no separate totals scan survives. No per-group sort anywhere.
    *
    * COST PROFILE, measured so the price over stat11 is a number and
    * not a smell (sf0.1 lineitem, cents values): the count table is
    * ~594k rows for 600k corpus rows — cents are nearly unique — so
    * both median passes read corpus-sized tables, and the MAD pass
    * cannot reuse the median pass's work (its order key |v − median|
    * depends on the median, which pass 1 produces; the passes are
    * sequential by data dependence). Round-15 removed two structural
    * copies (7.07 → 6.46 s); round-16's bucket-pruned medians removed
    * the two full-table windows, the totals scan, and the per-consumer
    * broadcast re-executions (6.9 → 3.2 s paired min-of-3 at sf0.1).
    * What remains is the honest floor: building + pinning the two
    * near-corpus-size count tables and the two boundary-sample/stats
    * passes over them.
    *
    * DEGENERATE-SCALE CAVEAT, documented not hidden: when a strict
    * majority of a group shares one value, MAD = 0 and Hampel's rule
    * degenerates to "any deviation is an outlier" — the standard MAD
    * failure mode; consumers gate on `mad > 0` if that is not wanted.
    * Null values fail fast naming the column.
    */
  /** Per-group Wilcoxon signed-rank statistic, EXACT: the PAIRED
    * counterpart to stat6's Mann–Whitney (Wilcoxon 1945 — "Individual
    * comparisons by ranking methods", the same paper), for "did the
    * metric move within matched pairs" questions (same order's first vs
    * second line item, same user's before/after, A/B on matched
    * twins). Nonzero differences are ranked by |d| ascending with
    * AVERAGE ranks at ties; W⁺ = Σ ranks of positive differences.
    * Average ranks are half-integers, so everything is emitted ×2 and
    * stays in integer arithmetic end-to-end: a tied |d| group occupying
    * positions [lo, hi] has avg-rank×2 = lo + hi = 2·cum − c + 1 (cum =
    * inclusive running count, c = group size) — engine- and
    * partitioning-exact, bit-identical on any engine.
    *
    * Output per group: `n_pairs` (nonzero differences), `n_zero`
    * (zero differences — DROPPED from the ranking, Wilcoxon's
    * procedure, but counted so the drop is visible, never silent),
    * `w_plus_x2`, `w_minus_x2` (invariant: w_plus_x2 + w_minus_x2 =
    * n·(n+1) — spec-pinned), and `tie_term` = Σ(t³ − t) over tied |d|
    * groups — the exact integer the normal-approximation variance
    * correction needs (Var = [n(n+1)(2n+1) − tie_term/2] / 24);
    * emitting the raw term keeps the operator integer-exact and leaves
    * the float approximation to the consumer.
    *
    * Scale shape (the stat6/stat11 discipline): ONE partial-aggregated
    * pass melts the pairs to the O(distinct (group, |d|)) count table
    * (zero diffs ride the same table at |d| = 0 — they sort FIRST, so
    * the nonzero rank is just cum − z, folded in by per-group algebra:
    * Σp·(2cum − c + 1) − 2z·Σp, no second corpus scan, no join);
    * per-group running counts ride ONE multi-series
    * [[Rank.globalRunningSum]]; the rest is one ordinary aggregate.
    * No per-group sort anywhere. Null differences fail fast naming the
    * column.
    */
  def wilcoxonSignedRank(df: DataFrame, groupCol: String,
      diffCol: String): DataFrame = {
    val d = integralOf("wilcoxonSignedRank", diffCol, role = "difference")
    val rows = df.select(col(groupCol).as("__grp"), d.as("__d"))
    val cnt = rows.groupBy(col("__grp"), abs(col("__d")).as("__a"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__d") > 0L, 1L).otherwise(0L)).as("__p"))
    val rm = Rank.globalRunningSum(cnt, "__a", "__c", outCol = "__cum",
      seriesCols = Seq("__grp"), distinctOrders = true)
    // per-group algebra instead of a z-join: for a > 0 rows the rank
    // base 2·cum − c + 1 counts the zero block too, and every nonzero
    // rank shifts down by exactly z — so subtract 2·z·(Σ signs) once
    // after aggregating
    rm.groupBy("__grp").agg(
        sum(when(col("__a") > 0L, col("__c"))).as("__n"),
        max(when(col("__a") === 0L, col("__c"))).as("__z"),
        sum(when(col("__a") > 0L,
          col("__p") * (lit(2L) * col("__cum") - col("__c") + 1L))).as("__sp"),
        sum(when(col("__a") > 0L, col("__p"))).as("__pp"),
        sum(when(col("__a") > 0L, (col("__c") - col("__p")) *
          (lit(2L) * col("__cum") - col("__c") + 1L))).as("__sm"),
        sum(when(col("__a") > 0L, col("__c") - col("__p"))).as("__qq"),
        sum(when(col("__a") > 0L && col("__c") > 1L,
          col("__c") * col("__c") * col("__c") - col("__c"))
          .otherwise(0L)).as("__tie"))
      .select(col("__grp").as(groupCol),
        coalesce(col("__n"), lit(0L)).as("n_pairs"),
        coalesce(col("__z"), lit(0L)).as("n_zero"),
        (coalesce(col("__sp"), lit(0L)) -
          lit(2L) * coalesce(col("__z"), lit(0L)) *
            coalesce(col("__pp"), lit(0L))).as("w_plus_x2"),
        (coalesce(col("__sm"), lit(0L)) -
          lit(2L) * coalesce(col("__z"), lit(0L)) *
            coalesce(col("__qq"), lit(0L))).as("w_minus_x2"),
        coalesce(col("__tie"), lit(0L)).as("tie_term"))
  }

  def madSummary(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"madSummary: k must be >= 1, got $k")
    val v = integralOf("madSummary", valueCol)
    val rows = df.select(col(groupCol).as("__grp"), v.as("__v"))
    val cnt = Materialize(
      rows.groupBy("__grp", "__v").agg(count(lit(1)).as("__c")))
    // Both order statistics ride the bucket-pruned
    // [[Rank.globalWeightedMedian]]: the old full-map formulation
    // (globalRunningSum + cum >= (n+1) DIV 2 filter) paid a full-table
    // window, a separate per-group totals corpus scan, and a join per
    // median, all to keep O(groups) rows; the pruned form windows ONE
    // target bucket per group and hands back a collected LocalRelation
    // (the same O(groups) driver state the broadcasts built anyway —
    // now built once, not once per consumer). Group totals n = Σ counts
    // ride the same stats pass, so the separate `tot` scan is gone too.
    // Measured on stat13 at sf0.1: 6.9 → 3.2 s (min-of-3, paired runs).
    val med = Rank.globalWeightedMedian(cnt, "__v", "__c",
      seriesCols = Seq("__grp"), totalOut = "n", medianOut = "__med")
    // The deviation table needs NO groupBy and NO pin (round-17, was a
    // Materialize'd groupBy): globalWeightedMedian tolerates duplicate
    // order values (a tie group's last row carries the full
    // deterministic group sum — its scaladoc), so merging the ±d rows
    // bought nothing the MAD median or the outlier sum needs, and that
    // groupBy was the query's last corpus-sized shuffle + checkpoint.
    // Recomputing this projection per pass is a shuffle-free columnar
    // scan of the pinned `cnt` + one broadcast join — the mba/d11 pin
    // rule (pin only when the recompute crosses a shuffle or shrinks
    // the data) says re-scan, hence pinInput = false below.
    val dev = cnt
      .join(broadcast(med.select("__grp", "__med")), "__grp")
      .select(col("__grp"), abs(col("__v") - col("__med")).as("__d"),
        col("__c"))
    val mad = Rank.globalWeightedMedian(dev, "__d", "__c",
      seriesCols = Seq("__grp"), totalOut = "__n2", medianOut = "__mad",
      pinInput = false)
    val outliers = dev.join(broadcast(mad.select("__grp", "__mad")), "__grp")
      .filter(col("__d") > lit(k.toLong) * col("__mad"))
      .groupBy("__grp").agg(sum(col("__c")).as("__out"))
    med.join(mad.select("__grp", "__mad"), "__grp")
      .join(broadcast(outliers), Seq("__grp"), "left")
      .select(col("__grp").as(groupCol), col("n"),
        col("__med").as("median"), col("__mad").as("mad"),
        coalesce(col("__out"), lit(0L)).as("outliers_n"))
  }

  /** Theil–Sen robust regression, engine-exact procedure (Theil 1950,
    * Sen 1968): slope = the median of pairwise slopes
    * (y_b − y_a)/(x_b − x_a) over all pairs with x_b > x_a, weighted
    * by multiplicity; intercept = the weighted median of the per-row
    * residuals y − slope·x — the robust-trend sibling of stat2's OLS
    * (breakdown point ~29% vs OLS's 0: a third of the rows can be
    * arbitrarily corrupt before the line moves), completing the robust
    * family next to stat13's location/scale and stat15's rank
    * agreement.
    *
    * Scale shape (the stat15 bounded-grid discipline): ONE partial-
    * aggregated pass melts the corpus to the O(distinct (x, y)) cell
    * table, pinned once; pairwise slopes come from a single broadcast
    * cell×cell dominance join (x_b > x_a — O(cells²), so the operator
    * REQUIRES a bounded domain, ≤ maxCells = 4096 distinct cells,
    * checked: quantize/bucket the axes first, the contingency-table
    * contract); both medians ride [[Rank.globalRunningSum]] weighted
    * prefix sums — the corpus is never self-joined and never re-sorted
    * through one task.
    *
    * EXACTNESS ARGUMENT, stated because medians of RATIONALS need one:
    * each pairwise slope num/den (longs, den > 0) maps to its
    * correctly-rounded IEEE double — one operation both engines state
    * identically — and rounding is MONOTONE, so ordering by the double
    * is order-faithful up to merging rationals within one ulp; merged
    * neighbors are indistinguishable at the emitted 6-decimal
    * precision, so the selected median value is engine-identical even
    * when the true rational order interleaves inside a double tie.
    * The weighted-median rank is the integer (W+1) DIV 2 over exact
    * long weights (lower median, no interpolation). The intercept pass
    * restates residuals as the same two IEEE ops (y − slope·x) on
    * exactly-representable longs. Fail-fasts: null/non-integral
    * coordinates ([[integralOf]]); a constant x axis raises (no pair
    * has x_b > x_a — a slope that never saw two x values would wear
    * the statistic's label).
    *
    * Output (one row): n, n_pairs, slope, intercept (both rounded to
    * 6 decimals).
    */
  def theilSen(df: DataFrame, xCol: String, yCol: String,
      maxCells: Int = 4096): DataFrame = {
    val rows = df.select(integralOf("theilSen", xCol).as("__x"),
      integralOf("theilSen", yCol).as("__y"))
    val cells = Materialize(
      rows.groupBy("__x", "__y").agg(count(lit(1)).as("__c")))
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"theilSen: $nCells distinct (x, y) cells — the pairwise-slope " +
        s"join is O(cells²); quantize/bucket the axes first (the " +
        s"contingency-table contract, max $maxCells)")
    // fail fast HERE, not through a downstream null-rank error: with a
    // constant x no pair has x_b > x_a and the slope is undefined. One
    // cheap action on the pinned ≤ maxCells-row table.
    require(cells.select("__x").distinct().count() >= 2L,
      "theilSen: x is constant — no pair has x_b > x_a and the slope " +
        "is undefined; feed a varying x axis")
    val a = cells.select(col("__x").as("__ax"), col("__y").as("__ay"),
      col("__c").as("__ca"))
    val b = cells.select(col("__x").as("__bx"), col("__y").as("__by"),
      col("__c").as("__cb"))
    val slopes = a.join(broadcast(b), col("__bx") > col("__ax"))
      .select(((col("__by") - col("__ay")).cast("double") /
        (col("__bx") - col("__ax")).cast("double")).as("__sd"),
        (col("__ca") * col("__cb")).as("__w"))
      .groupBy("__sd").agg(sum(col("__w")).as("__w"))
    // Both weighted medians ride the bucket-pruned
    // [[Rank.globalWeightedMedian]] (see madSummary): the totals W and
    // n come off its stats pass, killing the separate wTot/nTot scans,
    // and each full-map window + crossJoin + filter collapses to one
    // target-bucket window returning a 1-row LocalRelation. The selected
    // values are identical (family exactness invariant: offsets +
    // in-bucket cum = exact global cum).
    val slope = Rank.globalWeightedMedian(slopes, "__sd", "__w",
      totalOut = "__np", medianOut = "__slope")
    val resid = cells.crossJoin(broadcast(slope))
      .groupBy((col("__y").cast("double") -
        col("__slope") * col("__x").cast("double")).as("__r"))
      .agg(sum(col("__c")).as("__c"))
    val intercept = Rank.globalWeightedMedian(resid, "__r", "__c",
      totalOut = "__n", medianOut = "__int")
    intercept.crossJoin(broadcast(slope))
      .select(col("__n").as("n"), col("__np").as("n_pairs"),
        round(col("__slope"), 6).as("slope"),
        round(col("__int"), 6).as("intercept"))
  }

  /** Jonckheere–Terpstra ordered-alternative trend test, EXACT counts
    * (Terpstra 1952, Jonckheere 1954): for k groups with a natural
    * ORDER (dose levels, size buckets, ordered cohorts), J* sums the
    * Mann–Whitney "later group wins" counts over every ordered group
    * pair — the trend TEST next to [[theilSen]]'s trend ESTIMATE, and
    * strictly sharper than kruskal-style unordered tests when the
    * alternative is monotone. Mid-rank tie convention, kept integer by
    * the stat14 ×2 trick: J*×2 = 2·Σ#(v_a < v_b) + Σ#(v_a = v_b) over
    * pairs with g_a < g_b.
    *
    * Everything emitted is an exact long: `j_x2`, `u_tie` (tied cross-
    * group pairs — visible, not silently half-counted), `e_j_x4` =
    * n² − Σ n_i² (so E[J*] = e_j_x4/4 exactly), and `trend_x4` =
    * 2·j_x2 − e_j_x4 — an exact INTEGER whose sign is the trend
    * direction and whose magnitude is 4·(J* − E[J*]), so "is there an
    * increasing trend" needs no float anywhere. The null variance is
    * the CONSUMER's (Lehmann's tie-corrected formula needs only these
    * counts plus the marginals); exactness here means the counts are
    * engine- and partitioning-identical. Long arithmetic is exact to
    * n < ~3·10⁹ rows (j_x2, e_j_x4 ≤ n²) — raise past that, never
    * round (ANSI).
    *
    * Scale shape: the stat15/theilSen bounded-grid discipline — ONE
    * partial-aggregated pass to the O(distinct (group, value)) cell
    * table, pinned; one broadcast cell×cell dominance join on
    * g_b > g_a (REQUIRES ≤ maxCells = 4096 distinct cells, checked —
    * quantize values first); marginals off the same pinned table.
    * Fail-fasts: null/non-integral coordinates; a single group raises
    * (no ordered pair exists — a trend over one group is not a
    * statistic).
    */
  def jonckheereTerpstra(df: DataFrame, groupCol: String, valueCol: String,
      maxCells: Int = 4096): DataFrame = {
    val rows = df.select(integralOf("jonckheereTerpstra", groupCol,
        role = "group").as("__g2"),
      integralOf("jonckheereTerpstra", valueCol).as("__v"))
    val cells = Materialize(
      rows.groupBy("__g2", "__v").agg(count(lit(1)).as("__c")))
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"jonckheereTerpstra: $nCells distinct (group, value) cells — the " +
        s"dominance join is O(cells²); quantize the values first (the " +
        s"contingency-table contract, max $maxCells)")
    require(cells.select("__g2").distinct().count() >= 2L,
      "jonckheereTerpstra: a single group has no ordered pair — feed " +
        "at least two ordered groups")
    val a = cells.select(col("__g2").as("__ag"), col("__v").as("__av"),
      col("__c").as("__ca"))
    val b = cells.select(col("__g2").as("__bg"), col("__v").as("__bv"),
      col("__c").as("__cb"))
    val u = a.join(broadcast(b), col("__bg") > col("__ag"))
      .agg(
        coalesce(sum(when(col("__av") < col("__bv"),
          col("__ca") * col("__cb")).otherwise(0L)), lit(0L)).as("__lt"),
        coalesce(sum(when(col("__av") === col("__bv"),
          col("__ca") * col("__cb")).otherwise(0L)), lit(0L)).as("__tie"))
    val marg = cells.groupBy("__g2").agg(sum(col("__c")).as("__m"))
      .agg(sum(col("__m")).as("__n"), count(lit(1)).as("__k"),
        sum(col("__m") * col("__m")).as("__sq"))
    u.crossJoin(broadcast(marg))
      .select(col("__n").as("n"), col("__k").as("k"),
        (lit(2L) * col("__lt") + col("__tie")).as("j_x2"),
        col("__tie").as("u_tie"),
        (col("__n") * col("__n") - col("__sq")).as("e_j_x4"),
        (lit(2L) * (lit(2L) * col("__lt") + col("__tie")) -
          (col("__n") * col("__n") - col("__sq"))).as("trend_x4"))
  }
}
