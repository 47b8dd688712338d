package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity auditing over quasi-identifier columns.
  *
  * The reference platform's whole PII posture is "drop or hash the
  * obvious identifiers" (scripts/glue_etl/glue_job.py drops `email`,
  * hashes `name`); the release-readiness question a data platform must
  * also answer is re-identification by quasi-identifier COMBINATION
  * (the Sweeney result: zip+birthdate+sex identifies most of the US).
  * A relation is k-anonymous over a quasi-identifier set when every
  * combination present is shared by ≥ k rows.
  *
  * One hash-aggregate shuffle keyed on the quasi-identifier tuple;
  * `suppress` adds a broadcast-ready semi-join of the violating combos
  * back onto the relation — O(combinations) state, never O(rows).
  */
object Privacy {

  /** Quasi-identifier combinations with fewer than k rows — the groups a
    * release would have to suppress or generalize. NULL counts as a
    * value (a null zip is itself identifying when rare).
    */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_rows"))
      .filter(col("group_rows") < k)
  }

  /** Audit summary: total combos, violating combos, rows at risk, and the
    * smallest group size (the relation's actual k).
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_rows"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("group_rows") < k, 1L).otherwise(0L)).as("violating_groups"),
        sum(when(col("group_rows") < k, col("group_rows")).otherwise(0L)).as("rows_at_risk"),
        min(col("group_rows")).as("min_group_rows"))
  }

  /** The k-anonymous subset: rows whose quasi-identifier combination has
    * ≥ k occurrences (violating groups suppressed whole). Null-safe on
    * the group columns. The violating side is re-aliased before the join:
    * it derives from `df` itself, and `df(c) <=> bad(c)` on shared
    * attribute ids would lean on Spark's self-join disambiguation
    * heuristic (the "trivially true predicate" warning) instead of being
    * unambiguous by construction.
    */
  def suppress(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    val bad = kAnonymityViolations(df, quasiIds, k)
      .select(quasiIds.zipWithIndex.map { case (c, i) => col(c).as(s"_qid_$i") }: _*)
    val cond = quasiIds.zipWithIndex
      .map { case (c, i) => df(c) <=> bad(s"_qid_$i") }.reduce(_ && _)
    df.join(bad, cond, "left_anti")
  }

  /** t-closeness audit (Li et al. 2007) — the third leg of the privacy
    * triad after k-anonymity and l-diversity: even a diverse group leaks
    * when its SENSITIVE-VALUE DISTRIBUTION diverges from the corpus
    * (a group that's 90% one diagnosis is identifying regardless of how
    * many distinct diagnoses appear once). For a categorical sensitive
    * attribute the distance is total variation,
    * TVD(g) = ½ Σ_v |p_gv − q_v|, computed EXACTLY in integers:
    * |cnt_gv·N − cnt_v·n_g| summed over the FULL value grid (absent
    * cells contribute cnt_v·n_g), with ONE floor at the end —
    * `tvd_x1e6 = Σ · 10⁶ div (2·n_g·N)`. DECIMAL(38,0) throughout, so
    * the audit is engine-exact and safe past int64 at corpus scale
    * (the stat5/ksStatistic overflow discipline).
    *
    * Shuffle profile: cell/group/value counts are three partial-agg
    * shuffles; the grid is groups × values via broadcast cross join; N
    * rides in-plan as a broadcast scalar. Output one row per group with
    * its size and distance — `tvd_x1e6 ≤ t·10⁶` is the release gate.
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiIds.nonEmpty, "quasiIds must be non-empty")
    val qids = quasiIds.map(col)
    // cells join back onto the grid NULL-SAFELY (<=>): a null sensitive
    // value (or null quasi-id) is itself a distribution category — a
    // plain equi-join would zero its observed count while its margins
    // still enter the sum, inflating TVD for corpus-matching groups.
    // Cells are re-aliased first (suppress()'s self-join discipline).
    val cells = df.groupBy(qids :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__o"))
      .select((quasiIds.zipWithIndex.map { case (c, i) => col(c).as(s"__q_$i") } :+
        col(sensitiveCol).as("__s") :+ col("__o")): _*)
    val groups = df.groupBy(qids: _*).agg(count(lit(1)).as("__ng"))
    val values = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("__nv"))
    val tot = df.agg(count(lit(1)).as("__n"))
    val grid = groups.crossJoin(broadcast(values))
    val cond = quasiIds.zipWithIndex
      .map { case (c, i) => grid(c) <=> cells(s"__q_$i") }
      .reduce(_ && _) && grid(sensitiveCol) <=> cells("__s")
    grid.join(cells, cond, "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(tot))
      .groupBy(qids: _*)
      .agg(max(col("__ng")).as("group_rows"),
        expr("""(sum(abs(CAST(__o AS DECIMAL(38,0)) * __n - CAST(__nv AS DECIMAL(38,0)) * __ng))
               | * 1000000) div (2 * CAST(max(__ng) AS DECIMAL(38,0)) * max(__n))"""
          .stripMargin.replace("\n", " ")).cast("long").as("tvd_x1e6"))
  }

  /** Disparate-impact audit of a binary outcome across groups — the
    * four-fifths-rule check a filter model (quality gate, safety
    * classifier) goes through before its keep/drop decisions ship: for
    * each group, the positive-outcome rate and its ratio to the
    * MOST-FAVORED group's rate (so di_x1e9 ≤ 8·10⁸ flags a group the
    * 80% rule would question).
    *
    * Exact integer fixed-point end to end: `rate_x1e9 = pos·10⁹ div n`
    * per group, then `di_x1e9 = rate_x1e9·10⁹ div max(rate_x1e9)` — two
    * floors, both on non-negative integers, so Spark's `div` and an
    * oracle's `//` agree bit-for-bit at any partitioning. The FIRST
    * multiply runs in DECIMAL(38,0): `pos·10⁹` exceeds a long once a
    * group's positive count passes ~9.2·10⁹ — a realistic group size at
    * 100 TB — and non-ANSI Spark would wrap SILENTLY while a DuckDB
    * oracle (HUGEINT sums) stays exact; the widening matches the
    * sibling TVD operator's `tvd_x1e6` discipline (and the rate it
    * floors back to is ≤ 10⁹, so the long cast after the div is always
    * safe, as is the second multiply: rate·10⁹ ≤ 10¹⁸ < 2⁶³). One
    * partial-agg shuffle keyed on the group plus a broadcast scalar for
    * the max; O(groups) state. Fails fast when the most-favored rate is
    * zero (no group has a positive outcome — the ratio is undefined,
    * and silently emitting 0 would read as "perfectly fair").
    *
    * A NULL outcome counts as NOT positive (the `when(outcome, 1)`
    * otherwise-branch): an unknown decision is a non-keep for impact
    * purposes. A null GROUP is its own group, as in the k-anonymity
    * family — fairness over an "unknown segment" is still fairness.
    */
  /** The per-group rate stage, exposed for the overflow-bound spec: the
    * `pos·10⁹` product is computed in DECIMAL(38,0) (int128-class, like
    * the oracle's HUGEINT) so it cannot wrap at any achievable count;
    * `div` floors it back under 10⁹, where the long cast is exact.
    */
  private[graft] val rateX1e9Sql: String =
    "CAST(CAST(pos AS DECIMAL(38,0)) * 1000000000 div n AS BIGINT)"

  def disparateImpact(df: DataFrame, groupCol: String,
      outcome: Column): DataFrame = {
    val rates = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(outcome, 1L).otherwise(0L)).as("pos"))
      .withColumn("rate_x1e9", expr(rateX1e9Sql))
    val top = rates.agg(max(col("rate_x1e9")).as("__max_rate"))
    rates.crossJoin(broadcast(top))
      .select(col(groupCol), col("n"), col("pos"), col("rate_x1e9"),
        when(col("__max_rate") === 0,
          raise_error(lit("disparateImpact: no group has a positive " +
            "outcome — the impact ratio is undefined")))
          .otherwise(expr("rate_x1e9 * 1000000000 div __max_rate"))
          .as("di_x1e9"))
  }
}
