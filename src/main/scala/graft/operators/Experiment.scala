package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation readouts over the lake — the A/B-test face of the
  * engine. First resident: CUPED variance reduction (Deng, Xu, Kohavi &
  * Walker 2013, "Improving the Sensitivity of Online Controlled
  * Experiments by Utilizing Pre-Experiment Data"), the adjustment every
  * large experimentation platform applies before reading a metric.
  */
object Experiment {

  /** CUPED-adjust a per-unit experiment metric by a PRE-period
    * covariate: Y_adj = Y − θ·(X − E[X]) with θ = cov(X,Y)/var(X), the
    * variance-minimizing linear control variate. The covariate is
    * measured before assignment, so it is independent of the variant
    * and the adjustment is unbiased for every variant's mean while
    * shrinking its variance by the squared X–Y correlation — smaller
    * confidence intervals from the same traffic.
    *
    * Input is the PER-UNIT frame (one row per randomization unit with
    * its variant, metric, and covariate) — deriving it from an event
    * log is the caller's aggregation, which keeps this operator
    * orthogonal and the unit-integrity question (one variant per unit)
    * answerable where the unit key is known.
    *
    * Scale shape: ONE global aggregation for θ and E[X] (stable
    * single-pass moment aggregates — covar_pop/var_pop, O(1) driver
    * state) and ONE per-variant aggregation for the readout; the
    * adjustment itself is a map-side expression. 100 TB of units costs
    * two partial-aggregated scans.
    *
    * Fail-fasts on the θ pass: null variant/metric/covariate (a null
    * would silently drop from the moment sums while n counts it), and a
    * CONSTANT covariate (θ undefined — the pre-period signal carries no
    * information; picking θ = 0 silently would report raw means as
    * "adjusted").
    *
    * Returns per variant: n_units, mean_raw, mean_cuped, var_reduction
    * (1 − var(Y_adj)/var(Y), null for a zero-variance variant metric).
    * Means and the reduction RATIO are emitted (never raw variances):
    * ratios and means stay well-conditioned at any metric scale, which
    * is what makes a round-6 cross-engine contract hold.
    */
  /** Sample-ratio-mismatch (SRM) check — the guardrail every platform
    * runs BEFORE reading any metric: under an equal-split design the
    * per-variant unit counts should be multinomial(n, 1/k), and the
    * chi-squared goodness-of-fit statistic Σ (oᵢ − n/k)²/(n/k) flags a
    * broken randomizer / logging loss long before a metric does.
    *
    * Exact integer fixed point (the stat5 discipline): with equal
    * expected counts the statistic collapses algebraically —
    * Σ(oᵢ − n/k)²/(n/k) = (k·Σoᵢ² − n²)/n since Σoᵢ = n — so
    *   srm_x1e6 = (k·Σoᵢ² − n²)·10⁶ div n
    * runs entirely in DECIMAL(38,0) (k·Σo² ≤ k·n² ≤ 10²⁷ at a trillion
    * units and k ≤ 10³; ·10⁶ stays inside 38 digits) with ONE integer
    * floor, identical both engines: the readout is engine- and
    * partitioning-exact. ONE partial-aggregated pass over the unit
    * table, then an O(k) aggregate of the count table.
    *
    * Null variants fail fast — a null would silently form its own
    * "variant" and shift every expected count.
    *
    * Returns one row: (n_units, n_variants, srm_x1e6). Compare against
    * the chi-squared(k−1) critical value downstream; the statistic, not
    * the verdict, is the engine's job.
    */
  def srm(units: DataFrame, variantCol: String): DataFrame = {
    val counts = units.groupBy(col(variantCol).as("__v"))
      .agg(count(lit(1)).as("o"))
    counts.agg(
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("nullv"),
        sum(col("o")).as("n"),
        count(lit(1)).as("k"),
        sum(col("o").cast("decimal(38,0)") * col("o")).as("oo"))
      .select(col("nullv"), col("n"), col("k"),
        // chi2 = (k·Σo² − n²)/n exactly (Σo = n): only Σo² is needed —
        // no second pass over the count table
        expr("CAST((CAST(k AS DECIMAL(38,0)) * oo - CAST(n AS DECIMAL(38,0)) * n) " +
          "* 1000000 div n AS BIGINT)").as("srm_x1e6"))
      .select(
        when(col("nullv") > 0, raise_error(lit(
          "srm: null variant values — a null would form its own variant " +
            "and shift every expected count; filter first")))
          .otherwise(col("n")).as("n_units"),
        col("k").as("n_variants"), col("srm_x1e6"))
  }

  def cuped(units: DataFrame, variantCol: String, metricCol: String,
      covariateCol: String): DataFrame = {
    val x = col(covariateCol).cast("double")
    val y = col(metricCol).cast("double")
    val stats = units.agg(
      count(lit(1)).as("n"),
      sum(when(col(variantCol).isNull || x.isNull || y.isNull, 1)
        .otherwise(0)).as("bad"),
      avg(x).as("xbar"),
      var_pop(x).as("vx"),
      covar_pop(x, y).as("cxy")).collect()(0)
    require(stats.getLong(0) > 0, "cuped: empty input")
    require(stats.getLong(1) == 0,
      s"cuped: null values in '$variantCol'/'$metricCol'/'$covariateCol' " +
        "— filter or impute first (a null would silently drop from the " +
        "moment sums)")
    val vx = stats.getDouble(3)
    require(vx > 0.0,
      s"cuped: covariate '$covariateCol' is constant — θ is undefined and " +
        "the adjustment would be a no-op wearing an adjusted label")
    val theta = stats.getDouble(4) / vx
    val xbar = stats.getDouble(2)
    val adj: Column = y - lit(theta) * (x - lit(xbar))
    units.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n_units"),
        avg(y).as("mean_raw"),
        avg(adj).as("mean_cuped"),
        var_pop(y).as("__vy"),
        var_pop(adj).as("__va"))
      .select(col(variantCol), col("n_units"),
        col("mean_raw"), col("mean_cuped"),
        when(col("__vy") > 0, lit(1.0) - col("__va") / col("__vy"))
          .as("var_reduction"))
  }

  /** Difference-in-differences readout — the quasi-experimental
    * estimate when assignment isn't randomized but a PRE period exists:
    * did = (mean_T_post − mean_T_pre) − (mean_C_post − mean_C_pre),
    * the treatment effect net of the shared trend (parallel-trends
    * assumption is the caller's to defend; the engine's job is the
    * exact readout).
    *
    * Input is one row per (unit, period) with an INTEGER metric (cents
    * / counts — the exp2/pref2 fixed-point discipline); `variantCol`
    * and `periodCol` are 0/1 (0 = control / pre). All four cell means
    * are ×10⁶ fixed point with ONE truncating division each
    * (non-negative metric ⇒ DIV == floor ==  an oracle's `//`), and the
    * DiD is plain exact subtraction of those four floored means —
    * engine- and partitioning-exact, documented ±4·10⁻⁶ flooring bias.
    *
    * Scale shape: ONE partial-aggregated pass over the unit table (8
    * conditional aggregates, O(1) state) — no pivot, no join, no second
    * scan. Null columns, out-of-domain variant/period codes, and EMPTY
    * CELLS (a missing cell makes DiD undefined — emitting 0 would wear
    * an estimate's label) all raise with the offending cell named.
    */
  def did(units: DataFrame, variantCol: String, periodCol: String,
      metricCol: String): DataFrame = {
    def code(c: String): Column =
      when(col(c).isNull || (col(c).cast("long") =!= 0L &&
          col(c).cast("long") =!= 1L),
        raise_error(concat(lit(s"did: column '$c' must be 0/1, got "),
          coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c).cast("long"))
    // negative metrics fail fast, not just the nulls: the ×10⁶ means
    // below take ONE truncating DIV each, and DIV (toward zero) only
    // equals an oracle's floor `//` for non-negative numerators — a
    // refund-heavy cents column would silently flip the semantics
    val m = when(col(metricCol).isNull, raise_error(lit(
        s"did: null metric in '$metricCol' — filter or impute first")))
      .when(col(metricCol) < 0, raise_error(concat(
        lit(s"did: negative metric in '$metricCol' ("),
        col(metricCol).cast("string"),
        lit(") — the fixed-point means require a non-negative metric " +
          "(DIV == floor only there); shift or split the metric first"))))
      .otherwise(col(metricCol).cast("decimal(38,0)"))
    val v = code(variantCol)
    val p = code(periodCol)
    def cell(vv: Int, pp: Int, suffix: String) = Seq(
      sum(when(v === vv && p === pp, m)).as(s"__s_$suffix"),
      sum(when(v === vv && p === pp, 1L).otherwise(0L)).as(s"n_$suffix"))
    val cells = cell(1, 0, "t_pre") ++ cell(1, 1, "t_post") ++
      cell(0, 0, "c_pre") ++ cell(0, 1, "c_post")
    val aggd = units.agg(cells.head, cells.tail: _*)
    def mean(suffix: String): Column =
      when(col(s"n_$suffix") === 0, raise_error(lit(
        s"did: empty $suffix cell — DiD is undefined with a missing cell")))
        .otherwise(expr(s"CAST(__s_$suffix * 1000000 DIV n_$suffix AS BIGINT)"))
    aggd.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      mean("t_pre").as("m_t_pre_x1e6"), mean("t_post").as("m_t_post_x1e6"),
      mean("c_pre").as("m_c_pre_x1e6"), mean("c_post").as("m_c_post_x1e6"),
      ((mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre")))
        .as("did_x1e6"))
  }

  /** The four SPRT constants, quantized ONCE to ×10⁹ integers: per-
    * observation log-likelihood-ratio increments for success/failure
    * under H1: p = p1 vs H0: p = p0, and Wald's decision boundaries
    * ln((1−β)/α) (accept H1 at/above) and ln(β/(1−α)) (accept H0
    * at/below). Exposed so an oracle restates the IDENTICAL integers —
    * after this one quantization the entire test is integer arithmetic,
    * engine- and partitioning-exact.
    */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
      beta: Double): (Long, Long, Long, Long) = {
    require(p0 > 0 && p1 < 1 && p0 < p1,
      s"sprt: need 0 < p0 < p1 < 1, got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"sprt: need alpha, beta in (0, 0.5), got alpha=$alpha beta=$beta")
    (math.round(math.log(p1 / p0) * 1e9),
      math.round(math.log((1 - p1) / (1 - p0)) * 1e9),
      math.round(math.log((1 - beta) / alpha) * 1e9),
      math.round(math.log(beta / (1 - alpha)) * 1e9))
  }

  /** Wald's Sequential Probability Ratio Test (1945) over a Bernoulli
    * metric, replayed per arm on the event log — the "when could we
    * have stopped?" readout an experimentation pipeline serves next to
    * the fixed-horizon tests (exp1–exp3): walk each arm's observations
    * in `orderCol` order accumulating the log-likelihood ratio of
    * H1: p = p1 against H0: p = p0, and report the FIRST boundary
    * crossing (accept_h1 at ln((1−β)/α), accept_h0 at ln(β/(1−α))) or
    * `continue` if the data never decides.
    *
    * Exactness: the per-observation LLR increments and both boundaries
    * are quantized ×10⁹ once, in [[sprtConstants]] — from there the
    * walk is pure integer running sums, so crossing indices and
    * decisions are engine- and partitioning-exact (no accumulated FP
    * drift, the fixed-point-log-table discipline applied to Wald's
    * weights).
    *
    * Scale shape: the per-arm running LLR rides ONE multi-series
    * [[Rank.globalRunningSum]] (distributed prefix sums — never a
    * single-task global window; it also fail-fasts duplicate order
    * values per arm, which would make "first crossing" ill-defined);
    * first crossing is a min(struct) partial aggregate; arm totals are
    * their own 2-column scan (the stat11/ml15 measured-cheaper
    * pattern). 100 TB of events costs the prefix-sum passes.
    *
    * Output per arm: n, decision ('accept_h1' | 'accept_h0' |
    * 'continue'), at_order / llr_x1e9 (the crossing position and the
    * LLR value there; null when the walk never decides). Fail-fasts:
    * null arm, null success.
    */
  def sprt(df: DataFrame, armCol: String, orderCol: String,
      success: Column, p0: Double, p1: Double, alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame = {
    val (wSucc, wFail, up, lo) = sprtConstants(p0, p1, alpha, beta)
    val arm = when(col(armCol).isNull, raise_error(lit(
        s"sprt: null arm in '$armCol' — every observation needs an arm")))
      .otherwise(col(armCol))
    val w = when(success.isNull, raise_error(lit(
        "sprt: null success indicator — filter or impute first")))
      .when(success, lit(wSucc)).otherwise(lit(wFail))
    val rows = df.select(arm.as("__arm"), col(orderCol).as("__ord"),
      w.as("__w"))
    val rm = Rank.globalRunningSum(rows, "__ord", "__w", outCol = "__llr",
      seriesCols = Seq("__arm"))
    val crossing = rm
      .filter(col("__llr") >= up || col("__llr") <= lo)
      .groupBy("__arm")
      .agg(min(struct(col("__ord"), col("__llr"))).as("__x"))
      .select(col("__arm"), col("__x.__ord").as("at_order"),
        col("__x.__llr").as("llr_x1e9"))
    val totals = rows.groupBy("__arm").agg(count(lit(1)).as("n"))
    totals.join(crossing, Seq("__arm"), "left")
      .select(col("__arm").as(armCol), col("n"),
        when(col("llr_x1e9").isNull, "continue")
          .when(col("llr_x1e9") >= up, "accept_h1")
          .otherwise("accept_h0").as("decision"),
        col("at_order"), col("llr_x1e9"))
  }

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg 1995,
    * "Controlling the false discovery rate") over a battery of tests —
    * the multiple-testing correction a drift-alarm pipeline needs when
    * it runs thousands of per-metric/per-segment tests every hour and
    * a per-test α would fire hundreds of false alarms by construction.
    *
    * Input: one row per test with a p-value QUANTIZED ×10⁹ (`pCol`,
    * long in [0, 10⁹] — the same quantization the sprt constants use,
    * so the decision below is pure integer arithmetic and engine-
    * exact). The step-up rule: rank tests by p ascending, find the
    * LARGEST k with p₍ₖ₎ ≤ k·q/m, and reject every test with
    * p ≤ p₍ₖ₎. Both comparisons clear their denominators —
    * p·m ≤ k·q_x1e9, all longs (p ≤ 10⁹, so overflow needs m > 9·10⁹
    * tests; require()d) — and rejection is by the THRESHOLD p-value,
    * not by rank, so tied p-values share their fate whatever order the
    * ranking gave them.
    *
    * Scale shape: one [[Rank.globalRank]] over the battery (two-pass
    * distributed prefix-sum, no single-reducer sort), the ranked table
    * pinned once for its two consumers; the threshold is a one-row
    * aggregate broadcast back. The only driver-side values are the
    * test count and the threshold — two longs at any battery size.
    *
    * Output: (id, p_x1e9, p_rank, rejected) for EVERY test — the
    * accepted rows are the evidence of what the correction suppressed.
    * Null or out-of-domain p-values fail fast naming the column.
    */
  def bhFdr(df: DataFrame, idCol: String, pCol: String,
      qX1e9: Long = 50000000L): DataFrame = {
    require(qX1e9 > 0L && qX1e9 <= 1000000000L,
      s"bhFdr: q must be in (0, 1e9] x1e9 units, got $qX1e9")
    val p = when(col(pCol).isNull ||
        col(pCol) < 0L || col(pCol) > 1000000000L,
      raise_error(concat(lit(s"bhFdr: p-value column '$pCol' must be a " +
        "x1e9 long in [0, 1e9], got "),
        coalesce(col(pCol).cast("string"), lit("NULL")))))
      .otherwise(col(pCol).cast("long"))
    val base = df.select(col(idCol).as("__id"), p.as("__p"))
    val ranked = Materialize(
      Rank.globalRank(base, "__p", Seq("__id"), outCol = "__r"))
    val m = ranked.count()
    require(m <= 9000000000L,
      s"bhFdr: $m tests would overflow the cleared-denominator compare")
    val thr = ranked
      .filter(col("__p") * lit(m) <= col("__r") * lit(qX1e9))
      .agg(max(col("__p")).as("__t"))
    ranked.crossJoin(broadcast(thr))
      .select(col("__id").as(idCol), col("__p").as("p_x1e9"),
        col("__r").as("p_rank"),
        (col("__t").isNotNull && col("__p") <= col("__t")).as("rejected"))
  }
}
