package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 breadth: the analytics a platform team reaches for next once
  * the SURVEY.md §2 surface is green — deeper TPC-H-shape joins, rank
  * statistics, association-rule strength, changepoint detection, text
  * novelty/readability scoring, l-diversity, systematic sampling.
  *
  * Same oracle-parity discipline as every other family (QueryDef
  * scaladoc): identical column names, total ORDER BY, decimal-cast money
  * sums, fixed-point integer micro-units wherever a float reduction
  * would be order-sensitive, op-for-op double math elsewhere.
  */
object ExtendedQueries {

  import QueryDef.t

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** DuckDB-side whitespace tokenization (same contract as
    * TextAnalysis.tokens / TextQueries.duckToks).
    */
  private val duckToks =
    "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) " +
      "ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END"

  /** Exact-arithmetic bound for the chi-squared grid (stat5 / stat8).
    *
    * The per-cell contribution is floor((N·o − r·c)²·10⁶ / (N·r·c)) in
    * DECIMAL(38,0). A valid contingency table has o ≤ min(r, c) and
    * o ≥ max(0, r + c − N), which bounds the bracket BOTH ways:
    * N·o − r·c ≤ r(N − c) ≤ N²/4 and N·o − r·c ≥ −(N − r)(N − c) (or
    * ≥ −r·c when r + c ≤ N), each ≥ −N²/4 by AM–GM. So the numerator is
    * at most (N²/4)²·10⁶ = N⁴·10⁶/16, which fits 38 digits iff
    * N < 2·10⁸ (at N = 2·10⁸ the worst case is exactly 10³⁸ — one past
    * DECIMAL(38,0)'s max). Beyond that, ANSI-off Spark NULLs the
    * overflowed cell and `sum` silently drops it — a WRONG chi-squared,
    * not an error — so the term fails fast instead: every cell carries a
    * `raise_error` guard on N ≥ 2·10⁸. The DuckDB oracle has the same
    * ceiling (HUGEINT is 127-bit ≈ 1.7·10³⁸; it throws rather than
    * nulls). For populations past the bound, aggregate at a coarser
    * grain first or accept double-precision chi-squared — exactness at
    * unbounded N is not expressible in 128-bit integers.
    * ChiSquareBoundSpec pins both sides: the worst-case cell at
    * N = 2·10⁸ − 1 evaluates exactly (BigInt cross-check), and the
    * guard fires at N = 2·10⁸.
    */
  private[graft] val ChiSquareNMax = 200000000L

  /** Per-cell chi-squared term over columns (n, r, c, o) — see
    * [[ChiSquareNMax]] for the proven overflow bound the guard enforces.
    */
  private[graft] val chiCellTerm: String =
    s"""CASE WHEN n >= $ChiSquareNMax THEN CAST(raise_error(
       |'chi-squared grid: N >= 2e8 rows exceeds the exact DECIMAL(38,0)
       | headroom of the per-cell (N*o - r*c)^2 * 1e6 term; aggregate to
       | a coarser grain first') AS DECIMAL(38,0))
       |ELSE ((CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
       | * (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
       | * 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c) END"""
      .stripMargin.replace("\n", " ")

  /** Shared stat5/stat8 plan: the lang × source contingency grid built
    * by broadcast cross join (dims × dims rows, absent cells kept at
    * o = 0 — they still contribute r·c/N), N riding in-plan as a
    * broadcast scalar, reduced to ONE row
    * (__chi2_x1e6, __nr, __nc, __n). Shuffle profile at 100 TB: three
    * partial-agg shuffles of |cells|, |langs|, |sources| rows — no
    * driver collect anywhere.
    */
  private def chiSquareGridAgg(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rowT = d.groupBy("lang").agg(count(lit(1)).as("r"))
    val colT = d.groupBy("source").agg(count(lit(1)).as("c"))
    val tot = d.agg(count(lit(1)).as("n"))
    rowT.crossJoin(broadcast(colT))
      .join(cells, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .agg(
        sum(expr(chiCellTerm)).as("__chi2_x1e6"),
        countDistinct(col("lang")).as("__nr"),
        countDistinct(col("source")).as("__nc"),
        max(col("n")).as("__n"))
  }

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q7-shape: revenue volume between nation pairs by ship year.
    // Six-way join — the two fact sides (lineitem ⋈ orders ⋈ customer)
    // shuffle on their keys; supplier and both nation roles are
    // broadcast (dimension tables stay tiny at any SF, so the 100 TB
    // fact scan never shuffles for them). Pair orientation pinned
    // supp < cust for a total order and half the output.
    QueryDef("q7_nation_volume",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("volume"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "ship_year"),
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume,
             |count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |WHERE sn.n_name < cn.n_name
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", " "))),

    // Period-over-period percent change: monthly revenue per order
    // priority with a LAG window — the standard growth-dashboard query.
    // One keyed aggregate + one keyed window; the decimal revenue stays
    // exact until the final cast, and the pct division is op-for-op
    // identical on both engines (first month's pct is NULL).
    QueryDef("w12_pct_change",
      (s, dir) => {
        val m = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("priority"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
          .agg(sum(dec(col("o_totalprice"))).as("rev"))
        val w = Window.partitionBy("priority").orderBy("month")
        m.select(col("priority"), col("month"),
            col("rev").cast("double").as("revenue"),
            round((col("rev") - lag(col("rev"), 1).over(w)).cast("double") /
              lag(col("rev"), 1).over(w).cast("double") * 100, 6).as("pct_change"))
          .orderBy("priority", "month")
      },
      Some("""WITH m AS (SELECT o_orderpriority AS priority,
             |strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             |sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM orders GROUP BY 1, 2)
             |SELECT priority, month, CAST(rev AS DOUBLE) AS revenue,
             |ROUND(CAST(rev - lag(rev) OVER w AS DOUBLE) / CAST(lag(rev) OVER w AS DOUBLE) * 100, 6) AS pct_change
             |FROM m WINDOW w AS (PARTITION BY priority ORDER BY month)
             |ORDER BY priority, month""".stripMargin.replace("\n", " "))),

    // Spearman rank correlation between quantity and price, TIE-AWARE
    // (average ranks — the textbook statistic; the 1−6Σd²/n(n²−1)
    // shortcut only holds for distinct ranks, and lineitem carries no
    // unique row key to force them). No row identity needed: average
    // ranks attach per DISTINCT VALUE (doubled to stay integer:
    // R = 2·cnt_less + cnt_eq + 1), built from one groupBy per axis plus
    // a running sum over the distinct-value relation. DESIGN DOMAIN:
    // the rank maps are BROADCAST back onto the rows, so the whole
    // query presumes |V| (distinct values per axis) fits a broadcast —
    // within that domain the single-task window over |V| rows is
    // bounded by the same constant and measurably cheaper than the
    // distributed prefix sum's extra passes. Past it, swap BOTH the
    // window for Rank.globalRunningSum(seriesCols = Seq(axis)) — one
    // distributed prefix-sum pass covering both axes, RankSpec-pinned —
    // AND the broadcast joins for shuffle joins. Every aggregate is an
    // exact integer; the final Pearson-on-ranks formula is the only
    // float math, op-for-op mirrored (rank scaling cancels).
    QueryDef("stat4_spearman",
      (s, dir) => {
        val b = t(s, dir, "lineitem")
          .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        def rankMap(c: String): org.apache.spark.sql.DataFrame = {
          val w = Window.orderBy(c)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          b.groupBy(c).agg(count(lit(1)).as("c"))
            .select(col(c),
              (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c") + lit(1))
                .as(s"r$c"))
        }
        val dbl = (c: Column) => c.cast("double")
        // moment sums in DECIMAL(38,0): sxy ~ 4n³ wraps int64 past
        // ~1.3M rows (stat5's overflow discipline; headroom now n ≲ 3e12)
        val dec38 = (c: Column) => c.cast("decimal(38,0)")
        b.join(broadcast(rankMap("x")), "x").join(broadcast(rankMap("y")), "y")
          .agg(count(lit(1)).as("n"),
            sum(dec38(col("rx"))).as("sx"), sum(dec38(col("ry"))).as("sy"),
            sum(dec38(col("rx")) * col("ry")).as("sxy"),
            sum(dec38(col("rx")) * col("rx")).as("sxx"),
            sum(dec38(col("ry")) * col("ry")).as("syy"))
          .select(col("n"),
            round((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
              sqrt((dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
                (dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))), 6)
              .as("spearman_rho"))
      },
      Some("""WITH b AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
             |xr AS (SELECT x, 2 * (sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1 AS rx
             |FROM (SELECT x, count(*) AS c FROM b GROUP BY x)),
             |yr AS (SELECT y, 2 * (sum(c) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1 AS ry
             |FROM (SELECT y, count(*) AS c FROM b GROUP BY y)),
             |a AS (SELECT count(*) AS n, sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
             |sum(CAST(rx AS HUGEINT) * ry) AS sxy, sum(CAST(rx AS HUGEINT) * rx) AS sxx, sum(CAST(ry AS HUGEINT) * ry) AS syy
             |FROM b JOIN xr USING (x) JOIN yr USING (y))
             |SELECT n, ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS spearman_rho
             |FROM a""".stripMargin.replace("\n", " "))),

    // Association-rule confidence on the mba1 pair base: for each
    // co-purchased part pair, P(b|a) and P(a|b) in exact integer
    // micro-units (support·10⁶ div item-count — no float division at
    // all). Same scale shape as mba1: basket-local pair explosion, one
    // pair aggregate, broadcast item counts.
    QueryDef("mba2_confidence",
      (s, dir) => {
        // Round-17 shrink-then-pin — see mba1_lift for the full
        // rationale: pin the O(orders) basket arrays (smaller than their
        // recompute input, recompute crosses a shuffle — the rule's YES
        // profile), derive singleton counts from the pin, and the old
        // near-corpus (ok, pk) distinct exchange + its per-consumer
        // lineitem re-scans are gone. Results identical: baskets ARE the
        // distinct pk sets (collect_set), l_partkey is never null.
        val bk = graft.operators.Materialize(graft.operators.Graph
          .basketSets(t(s, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")),
            "ok", "pk"))
        val item = bk.select(explode(col("basket")).as("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
        // widen: see mba1_lift — the pinned basket relation AQE-coalesces
        // small, which would single-task the heavy pair explosion
        graft.operators.Graph
          .basketPairs(graft.operators.Rounds.widen(bk), "basket")
          .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .join(broadcast(item.select(col("pk").as("pa"), col("cnt").as("ca"))), "pa")
          .join(broadcast(item.select(col("pk").as("pb"), col("cnt").as("cb"))), "pb")
          .select(col("pa"), col("pb"), col("support"),
            expr("CAST((support * 1000000) div ca AS BIGINT)").as("conf_ab_micro"),
            expr("CAST((support * 1000000) div cb AS BIGINT)").as("conf_ba_micro"))
          .orderBy("pa", "pb")
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |item AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY pk),
             |pairs AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS support
             |FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT pa, pb, support,
             |CAST((support * 1000000) // ia.cnt AS BIGINT) AS conf_ab_micro,
             |CAST((support * 1000000) // ib.cnt AS BIGINT) AS conf_ba_micro
             |FROM pairs JOIN item ia ON pairs.pa = ia.pk JOIN item ib ON pairs.pb = ib.pk
             |ORDER BY pa, pb""".stripMargin.replace("\n", " "))),

    // Systematic sampling: every 20th row of the doc_id order — exact
    // stratified spacing (hash-Bernoulli samp1 guarantees only the
    // expectation). Positions via the distributed prefix-sum rank, not
    // a global window.
    QueryDef("samp10_systematic",
      (s, dir) => graft.operators.Rank.globalRank(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", Seq.empty, "pos")
        .filter((col("pos") - 1) % 20 === 0)
        .select(col("doc_id"), col("lang"), col("pos"))
        .orderBy("doc_id"),
      Some("""WITH r AS (SELECT doc_id, lang,
             |CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS pos FROM documents)
             |SELECT doc_id, lang, pos FROM r WHERE (pos - 1) % 20 = 0
             |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // PPS systematic sampling (Madow 1949): documents drawn
    // proportionally to byte size with systematic spacing — the πps
    // design for "big documents should be sampled more, with low
    // variance". Weight = octet_length + 1 (both engines count UTF-8
    // bytes), k = 100 skip points over the weight prefix sum; a
    // document spanning several points is drawn with multiplicity.
    // Pure integer arithmetic on non-negative operands (DIV == //), so
    // the DRAWN SAMPLE is engine-exact, not merely equal in
    // expectation. One distributed prefix sum, one broadcast totals
    // row, map-only select.
    QueryDef("samp12_pps_systematic",
      (s, dir) => graft.operators.Sampling.ppsSystematic(
          t(s, dir, "documents")
            .select(col("doc_id"), (octet_length(col("text")) + 1)
              .cast("long").as("wt")),
          "doc_id", "wt", k = 100)
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id,
             |  CAST(octet_length(encode(text)) + 1 AS BIGINT) AS wt FROM documents),
             |c AS (SELECT doc_id, wt, sum(wt) OVER (ORDER BY doc_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w),
             |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
             |st AS (SELECT tw, tw // 100 AS step FROM tot),
             |sel AS (SELECT doc_id, wt, cum,
             |  (cum - 1 + step) // step - (cum - wt - 1 + step) // step AS copies
             |  FROM c, st)
             |SELECT doc_id, wt AS weight, CAST(cum AS BIGINT) AS cum,
             |  CAST(copies AS BIGINT) AS copies
             |FROM sel WHERE copies > 0 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Per-document n-gram novelty (the curation signal behind "is this
    // doc mostly re-hashed earlier corpus?"): share of a doc's DISTINCT
    // word trigrams whose corpus-wide first occurrence (min doc_id) is
    // this doc. Exact integer micro-units. Two partial-agg shuffles
    // (per-doc distinct, per-gram min) + one join — no all-pairs
    // comparison anywhere. Docs under 3 tokens carry no trigram and are
    // omitted (both sides).
    QueryDef("t14_ngram_novelty",
      (s, dir) => {
        val tri = t(s, dir, "documents")
          .select(col("doc_id"),
            graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
            .as("g"))
          .distinct()
        val first = tri.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        tri.join(first, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("novel_grams"))
          .select(col("doc_id"), col("n_grams"), col("novel_grams"),
            expr("CAST((novel_grams * 1000000) div n_grams AS BIGINT)").as("novelty_micro"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
              |tri0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g FROM tok WHERE len(toks) >= 3),
              |tri AS (SELECT DISTINCT doc_id, g FROM tri0),
              |f AS (SELECT g, min(doc_id) AS first_doc FROM tri GROUP BY g)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              |CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
              |CAST((sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS novelty_micro
              |FROM tri JOIN f USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Flesch reading-ease in fixed-point micro-units: words (whitespace
    // tokens), sentences ([.!?]+ runs, min 1), syllables ([aeiouy]+
    // vowel runs — the standard heuristic). All-integer formula, so both
    // engines agree exactly; regexp counting is map-only over the scan.
    // Empty docs (0 words) are omitted on both sides.
    QueryDef("t15_readability",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("words"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("long").as("sentences"),
          regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("syllables"))
        .filter(col("words") > 0)
        .select(col("doc_id"), col("words"), col("sentences"), col("syllables"),
          expr("CAST(206835000 - (1015000 * words) div sentences - (84600000 * syllables) div words AS BIGINT)")
            .as("flesch_micro"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id,
              |CAST(len($duckToks) AS BIGINT) AS words,
              |CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
              |CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
              |FROM documents)
              |SELECT doc_id, words, sentences, syllables,
              |CAST(206835000 - (1015000 * words) // sentences - (84600000 * syllables) // words AS BIGINT) AS flesch_micro
              |FROM b WHERE words > 0 ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // l-diversity audit (the companion to priv1's k-anonymity): within
    // each quasi-identifier group, how many DISTINCT sensitive values
    // appear — a group of 50 rows that all share one sensitive value is
    // k-anonymous yet fully disclosive. Same single-aggregate shape.
    QueryDef("priv2_ldiversity",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("sens"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(countDistinct(col("sens")).as("diversity"), count(lit(1)).as("group_rows"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("diversity") < 2, 1L).otherwise(0L)).as("violating_groups"),
          sum(when(col("diversity") < 2, col("group_rows")).otherwise(0L)).as("rows_at_risk"),
          min(col("diversity")).as("min_diversity")),
      Some("""WITH g AS (SELECT c_mktsegment, c_nationkey,
             |count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END) AS diversity,
             |count(*) AS group_rows FROM customer GROUP BY 1, 2)
             |SELECT CAST(count(*) AS BIGINT) AS n_groups,
             |CAST(sum(CASE WHEN diversity < 2 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
             |CAST(sum(CASE WHEN diversity < 2 THEN group_rows ELSE 0 END) AS BIGINT) AS rows_at_risk,
             |CAST(min(diversity) AS BIGINT) AS min_diversity
             |FROM g""".stripMargin.replace("\n", " "))),

    // CUSUM changepoint statistic per user: S_t = R_t − min(0, min_{j≤t} R_j)
    // with R the running sum of (value − corpus mean), all in exact centi
    // units (the recurrence max(0, S+x−k) rewritten as prefix-sum minus
    // prefix-min — WINDOW-expressible, no sequential state). Keyed
    // windows only; the two scalar aggregates broadcast. Alarm at 500.00
    // cumulative drift.
    QueryDef("an4_cusum",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("user_id"), col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("vs"))
        val k = ev.agg(expr("CAST(sum(vs) div count(*) AS BIGINT)").as("k"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.crossJoin(broadcast(k))
          .withColumn("r", sum(col("vs") - col("k")).over(w))
          .withColumn("cusum", col("r") - least(min(col("r")).over(w), lit(0L)))
          .groupBy("user_id")
          .agg(max(col("cusum")).as("max_cusum_centi"), count(lit(1)).as("n_events"))
          .select(col("user_id"), col("max_cusum_centi"), col("n_events"),
            (col("max_cusum_centi") > 50000L).as("alarm"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS vs
             |FROM events WHERE value IS NOT NULL),
             |k AS (SELECT CAST(sum(vs) // count(*) AS BIGINT) AS k FROM ev),
             |r AS (SELECT user_id, event_id, ts, sum(vs - k) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM ev CROSS JOIN k),
             |c AS (SELECT user_id, r - least(min(r) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum FROM r)
             |SELECT user_id, CAST(max(cusum) AS BIGINT) AS max_cusum_centi,
             |count(*) AS n_events, max(cusum) > 50000 AS alarm
             |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Exact WEIGHTED percentiles (p25/median/p75) of price weighted by
    // quantity, per return flag — the estimator a6/a7's unweighted
    // percentiles can't express. Convention: lower weighted percentile
    // (smallest v whose cumulative weight reaches the threshold),
    // entirely integer comparisons. Weights aggregate per DISTINCT value
    // first, so value ties cannot make the cumulative walk
    // order-dependent; the keyed window runs over the (flag, value)
    // relation — |distinct values| rows, not the corpus.
    QueryDef("a15_weighted_percentiles",
      (s, dir) => {
        val g = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
          .agg(sum(col("l_quantity").cast("long")).as("wgt"))
        val w = Window.partitionBy("flag").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("cw", sum(col("wgt")).over(w))
          .join(broadcast(g.groupBy("flag").agg(sum(col("wgt")).as("tw"))), "flag")
          .groupBy("flag")
          .agg(min(when(col("cw") * 4 >= col("tw"), col("v"))).as("wp25"),
            min(when(col("cw") * 2 >= col("tw"), col("v"))).as("wmedian"),
            min(when(col("cw") * 4 >= col("tw") * 3, col("v"))).as("wp75"))
          .orderBy("flag")
      },
      Some("""WITH g AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
             |CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wgt FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT flag, v, wgt, sum(wgt) OVER (PARTITION BY flag ORDER BY v
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM g),
             |tt AS (SELECT flag, sum(wgt) AS tw FROM g GROUP BY flag)
             |SELECT flag, min(CASE WHEN cw * 4 >= tw THEN v END) AS wp25,
             |min(CASE WHEN cw * 2 >= tw THEN v END) AS wmedian,
             |min(CASE WHEN cw * 4 >= tw * 3 THEN v END) AS wp75
             |FROM c JOIN tt USING (flag) GROUP BY flag ORDER BY flag""".stripMargin.replace("\n", " "))),

    // TPC-H Q18-shape: large-volume orders — a HAVING aggregate on the
    // fact table that SHRINKS it (60k orders → ~200 survivors) before
    // the customer join, so the join's build side is the filtered agg,
    // not the corpus. l_quantity is integral-valued, so its double sum
    // is exact and associative (no decimal detour needed). Top-100 rides
    // TakeOrderedAndProject.
    QueryDef("q18_big_orders",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        t(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
             |FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
             |SELECT c_name, c_custkey, o_orderkey,
             |strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice, total_qty
             |FROM orders JOIN big ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin.replace("\n", " "))),

    // TPC-H Q16-shape: distinct supplier counts per part attribute,
    // EXCLUDING a NOT-IN supplier set (negative balances stand in for
    // the complaints predicate; the testdata ships no partsupp, so the
    // observed lineitem part↔supplier pairs are the association). Anti
    // join on a tiny broadcast exclusion list + one distinct-count
    // aggregate.
    QueryDef("q16_supplier_variety",
      (s, dir) => {
        val pairs = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        pairs.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |ok AS (SELECT l_partkey, l_suppkey FROM pairs
             |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
             |SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM ok JOIN part ON l_partkey = p_partkey
             |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin.replace("\n", " "))),

    // Power-of-two (log2) histogram of document lengths — the standard
    // heavy-tail profile. The bucket is length(bin(x)) − 1 = ⌊log2 x⌋,
    // exact INTEGER both engines (no transcendental log in sight), one
    // partial-agg shuffle.
    QueryDef("h4_log2_histogram",
      (s, dir) => t(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .groupBy((length(bin(col("n_chars"))) - 1).cast("long").as("log2_bucket"))
        .agg(count(lit(1)).as("docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy("log2_bucket"),
      Some("""SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
             |count(*) AS docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents WHERE n_chars > 0
             |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Multi-source BFS reachability radius over the supplier↔part
    // bipartite graph (pagerank's edge set): shortest hops ≤ 4 from the
    // seed suppliers. Pure integer hop counts — partitioning-invariant —
    // against DuckDB's recursive CTE bounded to the same radius.
    QueryDef("graph4_bfs",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sp = li.filter(col("l_orderkey") % 7 === 0)
          .select((col("l_suppkey") + 1000000).cast("long").as("src"),
            col("l_partkey").cast("long").as("dst"))
        val ps = li.filter(col("l_orderkey") % 7 === 1)
          .select(col("l_partkey").cast("long").as("src"),
            (col("l_suppkey") + 1000000).cast("long").as("dst"))
        val e = sp.unionByName(ps)
        val seeds = e.select(col("src").as("seed")).filter(col("seed") % 17 === 0)
        graft.operators.Graph.bfsHops(e, "src", "dst", seeds, "seed", maxHops = 4)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (
             |SELECT DISTINCT CAST(l_suppkey + 1000000 AS BIGINT) AS src, CAST(l_partkey AS BIGINT) AS dst FROM lineitem WHERE l_orderkey % 7 = 0
             |UNION
             |SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, CAST(l_suppkey + 1000000 AS BIGINT) AS dst FROM lineitem WHERE l_orderkey % 7 = 1),
             |walk(id, hop) AS (
             |SELECT DISTINCT src, 0 FROM e WHERE src % 17 = 0
             |UNION
             |SELECT e2.dst, walk.hop + 1 FROM walk JOIN e e2 ON walk.id = e2.src WHERE walk.hop < 4)
             |SELECT id, CAST(min(hop) AS BIGINT) AS hops FROM walk
             |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Pearson chi-squared independence test for two categoricals
    // (lang × source) — the categorical-drift / bias-audit companion to
    // PSI (drift2) and KS (drift3). All 128-bit-exact for N < 2·10⁸,
    // fail-fast past it (the proven DECIMAL(38,0) headroom of the
    // per-cell term — see [[ChiSquareNMax]]; HUGEINT on the oracle side
    // has the same ceiling). Plan shape: [[chiSquareGridAgg]].
    QueryDef("stat5_chi_square",
      (s, dir) => {
        // null categories are EXCLUDED up front (documented, mirrored in
        // the oracle): the grid join is a plain equi-join, and a null
        // lang/source would silently zero its observed cell while its
        // margins still entered the sum (the tCloseness null lesson —
        // there nulls are kept via a null-safe join because a null
        // sensitive value is a real distribution category; here a null
        // category has no place in an independence test).
        val d = t(s, dir, "documents")
          .filter(col("lang").isNotNull && col("source").isNotNull)
        chiSquareGridAgg(d)
          .select(
            col("__chi2_x1e6").cast("long").as("chi2_x1e6"),
            ((col("__nr") - 1) * (col("__nc") - 1)).cast("long").as("df"),
            col("__n").cast("long").as("n"))
      },
      Some("""WITH d AS (SELECT lang, source FROM documents
             |  WHERE lang IS NOT NULL AND source IS NOT NULL),
             |r AS (SELECT lang, count(*) AS r FROM d GROUP BY 1),
             |c AS (SELECT source, count(*) AS c FROM d GROUP BY 1),
             |o AS (SELECT lang, source, count(*) AS o FROM d GROUP BY 1, 2),
             |n AS (SELECT count(*) AS n FROM d),
             |grid AS (SELECT r.lang, c.source, r.r, c.c, COALESCE(o.o, 0) AS o, n.n
             |  FROM r CROSS JOIN c LEFT JOIN o ON o.lang = r.lang AND o.source = c.source CROSS JOIN n)
             |SELECT
             |CAST(sum(((CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
             |  * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
             |  * 1000000) // (CAST(n AS HUGEINT) * r * c)) AS BIGINT) AS chi2_x1e6,
             |CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS df,
             |CAST(max(n) AS BIGINT) AS n
             |FROM grid""".stripMargin.replace("\n", " "))),

    // Last-touch marketing attribution: each purchase is credited to the
    // most recent SAME-USER click within a 7-day lookback, rolled up to
    // attributed purchases + revenue per purchase day. One window pass
    // per user (last-ignore-nulls running carry over (ts, event_id) —
    // the same secondary-sort shape as sessionization, state O(1) per
    // key), then a partial-agg rollup; lookback compared in exact
    // microseconds (unix_micros/epoch_us — never float epoch seconds).
    // Revenue sums as DECIMAL(18,2): exact, associative, engine-stable.
    QueryDef("w13_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .withColumn("last_click_us",
            last(when(col("event_type") === "click", unix_micros(col("ts"))),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("last_click_us").isNotNull &&
            unix_micros(col("ts")) - col("last_click_us") <= 604800000000L)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_attributed"),
            sum(dec(col("value"))).cast("double").as("revenue"))
          .orderBy("day")
      },
      Some("""WITH carried AS (SELECT ts, event_type, value,
             |  last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
             |  FROM events)
             |SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_attributed,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM carried
             |WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
             |  AND epoch_us(ts) - last_click_us <= 604800000000
             |GROUP BY 1 ORDER BY day""".stripMargin.replace("\n", " "))),

    // Mann–Whitney U (Wilcoxon rank-sum) between two event populations —
    // the NON-PARAMETRIC two-sample location test completing the drift
    // family (KS tests shape, chi-square independence, U location).
    // stat4's tie-aware DOUBLED average ranks keep everything integer:
    // U1·2 = Σ_A rank×2 − n1(n1+1), summed in DECIMAL(38,0)/HUGEINT
    // (rank sums grow n² — the overflow discipline), emitted exact.
    // Null values are EXCLUDED up front and MIRRORED in the oracle: a
    // null has no rank, and the engines disagree on where one sorts
    // (Spark windows rank NULLS FIRST, DuckDB NULLS LAST) — without the
    // filter, parity held only because the testdata had no null value.
    // The rank map is built by Rank.globalRunningSum — the distributed
    // two-pass prefix sum over the distinct-value table, NOT a bare
    // Window.orderBy (a single reducer over O(distinct) rows, the
    // stat4-documented scale-killer) — then broadcast; one pass over
    // the rows.
    QueryDef("stat6_mannwhitney",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("event_type").isin("click", "error") &&
            col("value").isNotNull)
          .select(col("event_type").as("g"), col("value").as("v"))
        val cnt = b.groupBy("v").agg(count(lit(1)).as("c"))
        val rm = graft.operators.Rank.globalRunningSum(cnt, "v", "c",
          outCol = "__run", distinctOrders = true)
          .select(col("v"),
            (lit(2) * (col("__run") - col("c")) + col("c") + lit(1))
              .as("rv"))
        val dec = (c: Column) => c.cast("decimal(38,0)")
        b.join(broadcast(rm), "v")
          .agg(sum(when(col("g") === "click", 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === "error", 1L).otherwise(0L)).as("n2"),
            sum(when(col("g") === "click", dec(col("rv"))).otherwise(lit(0)))
              .as("r1x2"))
          .select(col("n1"), col("n2"),
            (col("r1x2") - dec(col("n1")) * (col("n1") + 1))
              .cast("long").as("u1_x2"))
      },
      Some("""WITH b AS (SELECT event_type AS g, value AS v FROM events
             |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
             |rm AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) + c + 1 AS rv
             |  FROM (SELECT v, count(*) AS c FROM b GROUP BY v)),
             |a AS (SELECT sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS n1,
             |  sum(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS n2,
             |  sum(CASE WHEN g = 'click' THEN CAST(rv AS HUGEINT) ELSE 0 END) AS r1x2
             |  FROM b JOIN rm USING (v))
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u1_x2
             |FROM a""".stripMargin.replace("\n", " "))),

    // Global running total WITHOUT the single-reducer window: cumulative
    // revenue (exact integer cents) over the unique event_id order via
    // Rank.globalRunningSum — event_id uniqueness is no longer an
    // unchecked data property: the operator now FAILS FAST on duplicate
    // order values (like its globalLag/globalSweep siblings), so a tied
    // order could never silently make run_cents partitioning-dependent.
    // It is the distributed two-pass prefix sum
    // (range-bucket, per-bucket sums to the driver as a handful of
    // longs, offsets + in-bucket window). The oracle states the same
    // thing as the textbook unpartitioned window, so this entry pins the
    // scale-shaped formulation against the single-sort semantics —
    // per-row over the WHOLE relation, the shape a bare Window.orderBy
    // funnels through one task at 100 TB.
    QueryDef("rank1_running_revenue",
      (s, dir) => {
        val rows = t(s, dir, "events")
          .select(col("event_id").cast("long").as("event_id"),
            (dec(col("value")) * 100).cast("long").as("cents"))
        graft.operators.Rank.globalRunningSum(rows, "event_id", "cents",
            outCol = "run_cents")
          .select(col("event_id"), col("cents"), col("run_cents"))
          .orderBy("event_id")
      },
      Some("""SELECT CAST(event_id AS BIGINT) AS event_id,
             |CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             |CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             |  OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
             |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Gini concentration of customer revenue — the Lorenz-curve summary
    // ([0,1]: 0 = every customer equal, →1 = one whale), the same metric
    // a curation pipeline runs over docs-per-source to audit corpus
    // concentration. Exact integers end to end: revenue as DECIMAL
    // cents, ascending position from Rank.globalRank (distributed
    // two-pass prefix sum — no single-reducer sort), then
    // G·10⁹ = (2·Σ r·x − (n+1)·Σx)·10⁹ div (n·Σx) in 128-bit
    // arithmetic. Ties in cents take arbitrary-but-distinct adjacent
    // ranks, which leaves Σ r·x unchanged (equal x within a tie run) —
    // deterministic under any partitioning. The numerator is
    // non-negative by the Chebyshev sum inequality, so floor division
    // agrees across engines. Headroom: Σ r·x ≤ n²·max_cents — at
    // n = 10¹⁰ customers and 10⁹ max cents that is 10²⁹·10⁹ = 10³⁸
    // edge; real revenue distributions sit orders below.
    QueryDef("stat10_gini",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("custkey"))
          .agg((sum(dec(col("o_totalprice"))) * 100).cast("long").as("cents"))
        val ranked = graft.operators.Rank.globalRank(rev, "cents",
          Seq("custkey"), outCol = "r")
        val d38 = (c: Column) => c.cast("decimal(38,0)")
        ranked.agg(
            count(lit(1)).as("__n"),
            sum(d38(col("cents"))).as("__sx"),
            sum(d38(col("r")) * d38(col("cents"))).as("__sxr"))
          .select(col("__n").cast("long").as("n_customers"),
            expr("""CAST(((2 * __sxr - (CAST(__n AS DECIMAL(38,0)) + 1) * __sx)
                   | * 1000000000) div (CAST(__n AS DECIMAL(38,0)) * __sx) AS BIGINT)"""
              .stripMargin.replace("\n", " ")).as("gini_x1e9"))
      },
      Some("""WITH rev AS (SELECT o_custkey AS custkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT cents, row_number() OVER (ORDER BY cents, custkey) AS r FROM rev),
             |a AS (SELECT count(*) AS n, sum(CAST(cents AS HUGEINT)) AS sx,
             |  sum(CAST(r AS HUGEINT) * cents) AS sxr FROM rk)
             |SELECT CAST(n AS BIGINT) AS n_customers,
             |CAST(((2 * sxr - (CAST(n AS HUGEINT) + 1) * sx) * 1000000000)
             |  // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS gini_x1e9
             |FROM a""".stripMargin.replace("\n", " "))),

    // Lorenz deciles — the curve stat10's Gini summarizes: customers in
    // ascending-revenue order cut into 10 equi-count buckets (decile =
    // (r−1)·10 div n over the SAME globalRank positions — no ntile, no
    // single-reducer window), each bucket's exact revenue share in
    // integer micro-units. The whole output is 10 rows; everything
    // heavier than the per-bucket partial agg stays distributed.
    QueryDef("w16_lorenz_deciles",
      (s, dir) => {
        val d38 = (c: Column) => c.cast("decimal(38,0)")
        val rev = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("custkey"))
          .agg((sum(dec(col("o_totalprice"))) * 100).cast("long").as("cents"))
        val ranked = graft.operators.Rank.globalRank(rev, "cents",
          Seq("custkey"), outCol = "r")
        // Totals from `ranked`, like stat10: globalRank pinned its
        // input, so this branch re-reads the pin plus the cheap
        // O(customers) window — hanging it off `rev` instead would
        // replay the orders scan + per-customer aggregation from source
        val tot = ranked.agg(count(lit(1)).as("__n"),
          sum(d38(col("cents"))).as("__t"))
        ranked.crossJoin(broadcast(tot))
          .groupBy(expr("CAST(((r - 1) * 10) div __n AS BIGINT)").as("decile"))
          .agg(count(lit(1)).as("n_customers"),
            expr("CAST((sum(CAST(cents AS DECIMAL(38,0))) * 1000000) div max(__t) AS BIGINT)")
              .as("share_x1e6"))
          .orderBy("decile")
      },
      Some("""WITH rev AS (SELECT o_custkey AS custkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT custkey, cents, row_number() OVER (ORDER BY cents, custkey) AS r FROM rev),
             |t AS (SELECT count(*) AS n, sum(CAST(cents AS HUGEINT)) AS t FROM rk)
             |SELECT CAST(((r - 1) * 10) // n AS BIGINT) AS decile,
             |count(*) AS n_customers,
             |CAST((sum(CAST(cents AS HUGEINT)) * 1000000) // max(t) AS BIGINT) AS share_x1e6
             |FROM rk CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Share-of-total (ratio-to-report): each event type's share of its
    // day's revenue, in exact integer micro-units — DECIMAL(18,2) cent
    // sums (associative), one partial-agg shuffle to (day, type), an
    // O(types)-row window per day for the denominator, 128-bit division.
    QueryDef("w14_share_of_total",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
        val w = Window.partitionBy("day")
        daily
          .withColumn("__day_cents", sum(col("cents")).over(w))
          .select(col("day"), col("event_type"),
            (col("cents").cast("double") / 100).as("revenue"),
            expr("(CAST(cents AS DECIMAL(38,0)) * 1000000) div __day_cents")
              .cast("long").as("share_x1e6"))
          .orderBy("day", "event_type")
      },
      Some("""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT day, event_type, cents,
             |  sum(cents) OVER (PARTITION BY day) AS day_cents FROM daily)
             |SELECT day, event_type, CAST(cents AS DOUBLE) / 100 AS revenue,
             |CAST((CAST(cents AS HUGEINT) * 1000000) // day_cents AS BIGINT) AS share_x1e6
             |FROM tot ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    // Longest consecutive-day activity streak per user, rolled to a
    // distribution — the gaps-and-islands pattern (island id = epoch-day
    // minus per-user row_number, constant exactly across a consecutive
    // run). One distinct shuffle to (user, day); the window then runs
    // over O(days) rows per user, never the event log; all integers.
    QueryDef("w15_streaks",
      (s, dir) => {
        val days = t(s, dir, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("d"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        days
          .withColumn("grp", col("d") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max(col("len")).as("streak_days"))
          .groupBy("streak_days").agg(count(lit(1)).as("n_users"))
          .orderBy("streak_days")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id,
             |  CAST(ts AS DATE) - DATE '1970-01-01' AS d FROM events),
             |isl AS (SELECT user_id, d,
             |  d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp FROM days),
             |st AS (SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, grp),
             |lg AS (SELECT user_id, max(len) AS streak_days FROM st GROUP BY 1)
             |SELECT CAST(streak_days AS BIGINT) AS streak_days, count(*) AS n_users
             |FROM lg GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Cramér's V effect size for the lang × source dependence — stat5's
    // chi-squared made interpretable ([0,1], comparable across table
    // shapes): V² = χ²/(N·min(r−1, c−1)), carried as exact integers to
    // the end — v2_x1e12 = chi2_x1e6 · 10⁶ div (N·min(r−1,c−1)) in
    // 128-bit arithmetic. Same broadcast-grid plan (and the same proven
    // N < 2·10⁸ fail-fast bound) as stat5: [[chiSquareGridAgg]].
    QueryDef("stat8_cramers_v",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .filter(col("lang").isNotNull && col("source").isNotNull)
        chiSquareGridAgg(d)
          .select(
            expr("""(CAST(__chi2_x1e6 AS DECIMAL(38,0)) * 1000000)
                   | div (CAST(__n AS DECIMAL(38,0)) * least(__nr - 1, __nc - 1))"""
              .stripMargin.replace("\n", " ")).cast("long").as("v2_x1e12"),
            col("__n").cast("long").as("n"))
      },
      Some("""WITH d AS (SELECT lang, source FROM documents
             |  WHERE lang IS NOT NULL AND source IS NOT NULL),
             |r AS (SELECT lang, count(*) AS r FROM d GROUP BY 1),
             |c AS (SELECT source, count(*) AS c FROM d GROUP BY 1),
             |o AS (SELECT lang, source, count(*) AS o FROM d GROUP BY 1, 2),
             |n AS (SELECT count(*) AS n FROM d),
             |grid AS (SELECT r.lang, c.source, r.r, c.c, COALESCE(o.o, 0) AS o, n.n
             |  FROM r CROSS JOIN c LEFT JOIN o ON o.lang = r.lang AND o.source = c.source CROSS JOIN n),
             |agg AS (SELECT
             |  sum(((CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
             |    * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
             |    * 1000000) // (CAST(n AS HUGEINT) * r * c)) AS chi2_x1e6,
             |  count(DISTINCT lang) AS nr, count(DISTINCT source) AS nc, max(n) AS n
             |  FROM grid)
             |SELECT CAST((CAST(chi2_x1e6 AS HUGEINT) * 1000000)
             |  // (CAST(n AS HUGEINT) * least(nr - 1, nc - 1)) AS BIGINT) AS v2_x1e12,
             |CAST(n AS BIGINT) AS n FROM agg""".stripMargin.replace("\n", " "))),

    // Benford first-digit audit — the classic fraud / synthetic-data
    // screen: observed first-significant-digit shares vs Benford's
    // log10(1+1/d), per digit, with the deviation in micro-units. The
    // Benford table is GENERATED in Scala and interpolated into both
    // engines as literals (the log2Table discipline — no runtime
    // transcendentals, no ulp surface). First digit comes from the
    // exact DECIMAL(18,2) cent representation (×100 shifts the decimal
    // point, never the leading digit), so there is no float-truncation
    // boundary: one map-only projection + one 9-row aggregate.
    QueryDef("stat7_benford",
      (s, dir) => {
        val benford: Map[Int, Long] = (1 to 9).map(d =>
          d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6)).toMap
        val expect = benford.toSeq.sortBy(_._1)
          .foldRight(lit(0L)) { case ((d, e), acc) =>
            when(col("digit") === d, lit(e)).otherwise(acc) }
        val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
        val digits = t(s, dir, "events")
          .filter(col("value") > 0)
          .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        digits
          .crossJoin(broadcast(digits.agg(sum(col("n")).as("__tot"))))
          .select(col("digit").cast("long").as("digit"), col("n"),
            expr("n * 1000000 div __tot").as("observed_x1e6"),
            expect.as("expected_x1e6"))
          .withColumn("dev_x1e6",
            abs(col("observed_x1e6") - col("expected_x1e6")))
          .orderBy("digit")
      },
      Some {
        val benford = (1 to 9).map(d =>
          d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6))
        val arms = benford.map { case (d, e) => s"WHEN digit = $d THEN $e" }
          .mkString(" ")
        s"""WITH digits AS (SELECT CAST(substr(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           |  FROM events WHERE value > 0),
           |counts AS (SELECT digit, count(*) AS n FROM digits GROUP BY 1),
           |tot AS (SELECT sum(n) AS t FROM counts)
           |SELECT CAST(digit AS BIGINT) AS digit, n,
           |CAST(n * 1000000 // t AS BIGINT) AS observed_x1e6,
           |CAST(CASE $arms ELSE 0 END AS BIGINT) AS expected_x1e6,
           |abs(CAST(n * 1000000 // t AS BIGINT) - CAST(CASE $arms ELSE 0 END AS BIGINT)) AS dev_x1e6
           |FROM counts CROSS JOIN tot ORDER BY digit""".stripMargin.replace("\n", " ")
      }),

    // t-closeness audit — the privacy triad's third leg after priv1
    // (k-anonymity) and priv2 (l-diversity): exact total-variation
    // distance between each segment's sensitive-value distribution and
    // the corpus's, in 128-bit integer arithmetic with one floor at the
    // end (Privacy.tCloseness scaladoc). Same acctbal banding as priv2.
    QueryDef("priv3_tcloseness",
      (s, dir) => graft.operators.Privacy.tCloseness(
          t(s, dir, "customer").select(col("c_mktsegment"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("sens")),
          Seq("c_mktsegment"), "sens")
        .orderBy("c_mktsegment"),
      Some("""WITH b AS (SELECT c_mktsegment AS seg,
             |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS sens FROM customer),
             |cells AS (SELECT seg, sens, count(*) AS o FROM b GROUP BY 1, 2),
             |g AS (SELECT seg, count(*) AS ng FROM b GROUP BY 1),
             |v AS (SELECT sens, count(*) AS nv FROM b GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM b),
             |grid AS (SELECT g.seg, v.sens, g.ng, v.nv, COALESCE(c.o, 0) AS o, n.n
             |  FROM g CROSS JOIN v LEFT JOIN cells c ON c.seg = g.seg AND c.sens = v.sens CROSS JOIN n)
             |SELECT seg AS c_mktsegment, CAST(max(ng) AS BIGINT) AS group_rows,
             |CAST((sum(abs(CAST(o AS HUGEINT) * n - CAST(nv AS HUGEINT) * ng)) * 1000000)
             |  // (2 * CAST(max(ng) AS HUGEINT) * max(n)) AS BIGINT) AS tvd_x1e6
             |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Disparate-impact audit — the privacy/governance quartet's fairness
    // leg: per-group positive rate of a keep/drop outcome and its ratio
    // to the MOST-FAVORED group (four-fifths rule: di_x1e9 ≤ 8·10⁸
    // flags a group). Exact integer fixed point, two floors on
    // non-negative integers — Spark `div` == DuckDB `//` bit-for-bit;
    // the pos·10⁹ product is DECIMAL(38,0) on the Spark side exactly
    // because DuckDB's is HUGEINT (sum of integers widens): both engines
    // stay exact past pos ≈ 9.2·10⁹, where a long would wrap silently.
    // Outcome = a balance-threshold keep gate over customer segments.
    QueryDef("priv4_disparate_impact",
      (s, dir) => graft.operators.Privacy.disparateImpact(
          t(s, dir, "customer"), "c_mktsegment",
          col("c_acctbal") >= 1000)
        .orderBy("c_mktsegment"),
      Some("""WITH r AS (SELECT c_mktsegment, count(*) AS n,
             |  sum(CASE WHEN c_acctbal >= 1000 THEN 1 ELSE 0 END) AS pos
             |  FROM customer GROUP BY 1),
             |x AS (SELECT c_mktsegment, n, pos, pos * 1000000000 // n AS rate_x1e9 FROM r),
             |m AS (SELECT max(rate_x1e9) AS mx FROM x)
             |SELECT c_mktsegment, n, CAST(pos AS BIGINT) AS pos,
             |CAST(rate_x1e9 AS BIGINT) AS rate_x1e9,
             |CAST(rate_x1e9 * 1000000000 // mx AS BIGINT) AS di_x1e9
             |FROM x CROSS JOIN m ORDER BY c_mktsegment""".stripMargin.replace("\n", " "))),

    // Autocorrelation of the hourly event-count series at lags 1 and 24
    // (the seasonality diagnostic: does last hour / the same hour
    // yesterday predict this hour?). The raw stream collapses to one
    // bounded series per type via a partial-agg shuffle FIRST — the lag
    // window then runs over O(hours) rows per key, never the event log.
    // Counts are exact integers; corr merges per-partition moment
    // summaries (stat1's contract: engines agree to ~1e-12, both sides
    // round to 6 decimals). Sparse semantics: absent hours are absent
    // rows (lag skips them) — gap-fill first (w7) for strict-calendar ACF.
    QueryDef("ts1_autocorr",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("h")
        hourly
          .withColumn("lag1", lag(col("cnt"), 1).over(w))
          .withColumn("lag24", lag(col("cnt"), 24).over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_hours"),
            round(corr(col("cnt"), col("lag1")), 6).as("acf1"),
            round(corr(col("cnt"), col("lag24")), 6).as("acf24"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |lagged AS (SELECT event_type, cnt,
             |  lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY h) AS lag1,
             |  lag(cnt, 24) OVER (PARTITION BY event_type ORDER BY h) AS lag24 FROM hourly)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |round(corr(cnt, lag1), 6) AS acf1, round(corr(cnt, lag24), 6) AS acf24
             |FROM lagged GROUP BY 1 ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // CUPED variance reduction (Deng/Xu/Kohavi/Walker 2013) — the
    // adjustment every experimentation platform applies before reading
    // an A/B metric: Y_adj = Y − θ(X − E[X]) with θ = cov/var from the
    // PRE-period covariate. Units are users (variant = user_id parity),
    // X = first-half-of-month value sum, Y = second-half sum — activity
    // level persists across halves, so θ is real and the reduction
    // positive. Means and the reduction RATIO are round-6 doubles (the
    // stat1/ts1 float contract; ratios stay well-conditioned where raw
    // variances would not be).
    QueryDef("exp1_cuped",
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val units = t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy(col("user_id"))
          .agg(pmod(col("user_id"), lit(2)).cast("long").as("variant"),
            coalesce(sum(when(col("ts") < cut, col("value"))), lit(0.0)).as("x"),
            coalesce(sum(when(col("ts") >= cut, col("value"))), lit(0.0)).as("y"))
        graft.operators.Experiment.cuped(units, "variant", "y", "x")
          .select(col("variant"), col("n_units"),
            round(col("mean_raw"), 6).as("mean_raw"),
            round(col("mean_cuped"), 6).as("mean_cuped"),
            round(col("var_reduction"), 6).as("var_reduction"))
          .orderBy("variant")
      },
      Some("""WITH units AS (SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             |  coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN value END), 0.0) AS x,
             |  coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN value END), 0.0) AS y
             |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
             |g AS (SELECT avg(x) AS xbar, covar_pop(x, y) / var_pop(x) AS theta FROM units)
             |SELECT variant, count(*) AS n_units,
             |round(avg(y), 6) AS mean_raw,
             |round(avg(y - (SELECT theta FROM g) * (x - (SELECT xbar FROM g))), 6) AS mean_cuped,
             |round(CASE WHEN var_pop(y) > 0 THEN 1.0 - var_pop(y - (SELECT theta FROM g) * (x - (SELECT xbar FROM g))) / var_pop(y) END, 6) AS var_reduction
             |FROM units GROUP BY variant ORDER BY variant""".stripMargin.replace("\n", " "))),

    // Sample-ratio-mismatch guardrail — the chi-squared GOF statistic on
    // per-variant unit counts under an equal-split design, run BEFORE
    // any metric is read. Exact integer fixed point: the equal-expected
    // statistic collapses to (k·Σo² − n²)/n, one DECIMAL(38,0)/HUGEINT
    // floor on both engines (the stat5 discipline) — bit-exact at any
    // SF and partitioning. Units are distinct users, variant = id mod 4.
    QueryDef("exp2_srm",
      (s, dir) => {
        val units = t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("user_id")).distinct()
          .select(pmod(col("user_id"), lit(4)).cast("long").as("variant"))
        graft.operators.Experiment.srm(units, "variant")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
             |c AS (SELECT user_id % 4 AS v, count(*) AS o FROM u GROUP BY 1),
             |a AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS k, sum(CAST(o AS HUGEINT) * o) AS oo FROM c)
             |SELECT n AS n_units, CAST(k AS BIGINT) AS n_variants,
             |CAST((k * oo - CAST(n AS HUGEINT) * n) * 1000000 // n AS BIGINT) AS srm_x1e6
             |FROM a""".stripMargin.replace("\n", " "))),

    // Difference-in-differences — the quasi-experimental readout when
    // assignment isn't randomized but a pre-period exists: treatment
    // effect net of the shared trend. Experiment.did: ONE partial-agg
    // pass over the (unit, period) table — 8 conditional aggregates,
    // no pivot/join — four ×1e6 floored cell means (non-negative cents
    // ⇒ DIV == //), DiD exact subtraction of the four. Unit-period
    // metric = per-user cents per month half; "treatment" = user parity.
    QueryDef("exp3_did",
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val units = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .groupBy(col("user_id"),
            when(col("ts") < cut, 0L).otherwise(1L).as("period"))
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("m"))
          .select(pmod(col("user_id"), lit(2)).cast("long").as("variant"),
            col("period"), col("m"))
        graft.operators.Experiment.did(units, "variant", "period", "m")
      },
      Some("""WITH u AS (SELECT user_id,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS period,
             |  sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS m
             |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2),
             |c AS (SELECT
             |  sum(CASE WHEN user_id % 2 = 1 AND period = 0 THEN 1 ELSE 0 END) AS n_t_pre,
             |  sum(CASE WHEN user_id % 2 = 1 AND period = 1 THEN 1 ELSE 0 END) AS n_t_post,
             |  sum(CASE WHEN user_id % 2 = 0 AND period = 0 THEN 1 ELSE 0 END) AS n_c_pre,
             |  sum(CASE WHEN user_id % 2 = 0 AND period = 1 THEN 1 ELSE 0 END) AS n_c_post,
             |  sum(CASE WHEN user_id % 2 = 1 AND period = 0 THEN CAST(m AS HUGEINT) END) AS s_t_pre,
             |  sum(CASE WHEN user_id % 2 = 1 AND period = 1 THEN CAST(m AS HUGEINT) END) AS s_t_post,
             |  sum(CASE WHEN user_id % 2 = 0 AND period = 0 THEN CAST(m AS HUGEINT) END) AS s_c_pre,
             |  sum(CASE WHEN user_id % 2 = 0 AND period = 1 THEN CAST(m AS HUGEINT) END) AS s_c_post
             |  FROM u)
             |SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre, CAST(n_t_post AS BIGINT) AS n_t_post,
             |CAST(n_c_pre AS BIGINT) AS n_c_pre, CAST(n_c_post AS BIGINT) AS n_c_post,
             |CAST(s_t_pre * 1000000 // n_t_pre AS BIGINT) AS m_t_pre_x1e6,
             |CAST(s_t_post * 1000000 // n_t_post AS BIGINT) AS m_t_post_x1e6,
             |CAST(s_c_pre * 1000000 // n_c_pre AS BIGINT) AS m_c_pre_x1e6,
             |CAST(s_c_post * 1000000 // n_c_post AS BIGINT) AS m_c_post_x1e6,
             |CAST((s_t_post * 1000000 // n_t_post) - (s_t_pre * 1000000 // n_t_pre)
             |  - ((s_c_post * 1000000 // n_c_post) - (s_c_pre * 1000000 // n_c_pre)) AS BIGINT) AS did_x1e6
             |FROM c""".stripMargin.replace("\n", " "))),

    // Exact 5%-each-side TRIMMED mean of line price per return flag —
    // the robust location estimate between the raw mean (outlier-owned)
    // and p10's winsorize (which clips but keeps the tail rows' count).
    // Order-statistics-exact WITHOUT a per-flag single-task sort: one
    // partial-agg pass melts the corpus to the O(distinct (flag,
    // cents)) count table; the kept sum is ONE bucket-pruned
    // Rank.globalBandedSum over it — each distinct price's kept
    // multiplicity is CLOSED-FORM (its cumulative rank range
    // [cum−c+1, cum] intersected with the kept band [k+1, n−k],
    // k = n·5 DIV 100), fully-in-band buckets contribute their
    // stats-pass Σ cents·c with no window at all, and the
    // partial-inclusion arithmetic at the two trim boundaries lands on
    // integers, so the kept sum is exact cents in DECIMAL(38,0) and
    // mean_x1e6 one truncating division (kept sum ≥ 0: DIV == //).
    QueryDef("stat11_trimmed_mean",
      (s, dir) => {
        val rows = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        val cnt = rows.groupBy("g", "cents").agg(count(lit(1)).as("c"))
        // the kept sum rides the bucket-pruned Rank.globalBandedSum:
        // fully-in-band buckets contribute their stats-pass Σ cents·c
        // with no window, only the two band-edge buckets per flag are
        // windowed, and the per-flag totals come off the same stats
        // pass — replacing the full running-sum map + totals scan +
        // corpus-sized keep aggregate of the old formulation
        val ts = graft.operators.Rank.globalBandedSum(cnt, "cents", "c",
          loOf = w => w * 5L / 100L + 1L, hiOf = w => w - w * 5L / 100L,
          seriesCols = Seq("g"), totalOut = "n", sumOut = "__sum_kept")
        ts.select(col("g"), col("n"),
            (col("n") - lit(2) * expr("n * 5 DIV 100")).as("trimmed_n"),
            expr("CAST(__sum_kept * 1000000 DIV (n - 2 * (n * 5 DIV 100)) AS BIGINT)")
              .as("trimmed_mean_x1e6"))
          .orderBy("g")
      },
      Some("""WITH r AS (SELECT l_returnflag AS g,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM lineitem),
             |cnt AS (SELECT g, cents, count(*) AS c FROM r GROUP BY g, cents),
             |rm AS (SELECT g, cents, c, sum(c) OVER (PARTITION BY g ORDER BY cents
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cnt),
             |tot AS (SELECT g, count(*) AS n, count(*) * 5 // 100 AS k FROM r GROUP BY g),
             |kept AS (SELECT rm.g, max(n) AS n, max(k) AS k,
             |  sum(CAST(cents AS HUGEINT) *
             |    greatest(least(cum, n - k) - greatest(cum - c + 1, k + 1) + 1, 0)) AS sum_kept
             |  FROM rm JOIN tot ON rm.g = tot.g GROUP BY rm.g)
             |SELECT g, CAST(n AS BIGINT) AS n, CAST(n - 2 * k AS BIGINT) AS trimmed_n,
             |CAST(sum_kept * 1000000 // (n - 2 * k) AS BIGINT) AS trimmed_mean_x1e6
             |FROM kept ORDER BY g""".stripMargin.replace("\n", " "))),

    // EXACT two-sample Kolmogorov–Smirnov distance between the even-
    // and odd-user value distributions — the drift detector run between
    // cohorts before trusting "same pipeline, same distribution". The
    // per-value statistic is the ECDF difference CROSS-MULTIPLIED to
    // integers (|cum_a·n_b − cum_b·n_a| in DECIMAL(38,0)/HUGEINT), so
    // the max, its location (lowest value tie-break), and the ×10⁹
    // quantized distance are bit-identical across engines. One melt to
    // the O(distinct cents) count table with BOTH cohorts' counts on
    // the same row (zeros included — the ECDF alignment), per-side
    // running counts on ONE multi-series Rank.globalRunningSum.
    QueryDef("stat12_ks_2samp",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("side"),
            (dec(col("value")) * 100).cast("long").as("cents"))
        graft.operators.Stats.ksTwoSample(b, "side", "cents")
      },
      Some("""WITH b AS (SELECT user_id % 2 AS s,
             |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
             |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
             |cnt AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM b GROUP BY v),
             |rm AS (SELECT v,
             |  sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cua,
             |  sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cub FROM cnt),
             |tot AS (SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS na,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS nb FROM b),
             |num AS (SELECT v, abs(CAST(cua AS HUGEINT) * nb - CAST(cub AS HUGEINT) * na) AS num,
             |  na, nb FROM rm, tot)
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(num * 1000000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_x1e9,
             |  v AS at_value FROM num
             |ORDER BY num DESC, v ASC LIMIT 1""".stripMargin.replace("\n", " "))),

    // Two-sample Cramér–von Mises criterion — stat12's body-sensitive
    // sibling over the same cohorts: KS reads the single worst ECDF
    // gap, CvM integrates the SQUARED gap over every pooled
    // observation, catching mid-distribution shifts KS underweights.
    // Same device: integer cross-multiplied gaps D = cum_a·n_b −
    // cum_b·n_a, Σ c_v·D_v² exact in DECIMAL(38,0)/HUGEINT, ×10⁹
    // truncating DIV — engine-exact end to end, one melt + ONE
    // multi-series running-count pass.
    QueryDef("stat16_cvm_2samp",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("side"),
            (dec(col("value")) * 100).cast("long").as("cents"))
        graft.operators.Stats.cvmTwoSample(b, "side", "cents")
      },
      Some("""WITH b AS (SELECT user_id % 2 AS s,
             |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
             |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
             |cnt AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM b GROUP BY v),
             |rm AS (SELECT v, ca, cb,
             |  sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cua,
             |  sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cub FROM cnt),
             |tot AS (SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS na,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS nb FROM b),
             |w AS (SELECT CAST(ca + cb AS HUGEINT) *
             |  (CAST(cua AS HUGEINT) * nb - CAST(cub AS HUGEINT) * na) *
             |  (CAST(cua AS HUGEINT) * nb - CAST(cub AS HUGEINT) * na) AS w,
             |  na, nb FROM rm, tot)
             |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             |  CAST(sum(w) * 1000000000 // (CAST(max(na) AS HUGEINT) * max(nb) *
             |  (max(na) + max(nb)) * (max(na) + max(nb))) AS BIGINT) AS cvm_x1e9
             |FROM w""".stripMargin.replace("\n", " "))),

    // Two-sample Anderson-Darling, tie-adjusted (Scholz-Stephens
    // 1987) — the TAIL-weighted member completing the ECDF trio
    // (stat12 sup-norm, stat16 uniform L2): the 1/(H(1-H)) weight
    // makes tail disagreement count, the drift case the other two
    // underweight. Midranks ride the ×2 integer trick, the ×4-cleared
    // denominator D4 = B2(2N-B2) - N·l is a plain long, each
    // per-(side, value) term floor-quantizes ONCE at ×10⁹ through the
    // cvm Euclidean split, and the sum is exact integers — DuckDB
    // replays every floor, so the statistic is engine-exact by
    // construction, not by float luck. Same melt + ONE multi-series
    // running count as stat12/16.
    QueryDef("stat19_ad_2samp",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("side"),
            (dec(col("value")) * 100).cast("long").as("cents"))
        graft.operators.Stats.adTwoSample(b, "side", "cents")
      },
      Some("""WITH b AS (SELECT user_id % 2 AS s,
             |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
             |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
             |cnt AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM b GROUP BY v),
             |rm AS (SELECT v, ca, cb,
             |  sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cua,
             |  sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cub FROM cnt),
             |tot AS (SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS na,
             |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS nb, count(*) AS nn FROM b),
             |q AS (SELECT ca + cb AS l, 2*(cua + cub) - (ca + cb) AS b2,
             |  2*cua - ca AS m2a, 2*cub - cb AS m2b, na, nb, nn FROM rm, tot),
             |w AS (SELECT l, na, nb, nn,
             |  b2 * (2*nn - b2) - nn * l AS d4,
             |  CAST(nn AS HUGEINT) * m2a - CAST(na AS HUGEINT) * b2 AS ua,
             |  CAST(nn AS HUGEINT) * m2b - CAST(nb AS HUGEINT) * b2 AS ub FROM q),
             |tm AS (SELECT
             |  CASE WHEN d4 > 0 THEN
             |    (CAST(l AS HUGEINT) * ua * ua // (CAST(d4 AS HUGEINT) * na)) * 1000000000 +
             |    ((CAST(l AS HUGEINT) * ua * ua % (CAST(d4 AS HUGEINT) * na)) * 1000000000)
             |      // (CAST(d4 AS HUGEINT) * na) ELSE 0 END +
             |  CASE WHEN d4 > 0 THEN
             |    (CAST(l AS HUGEINT) * ub * ub // (CAST(d4 AS HUGEINT) * nb)) * 1000000000 +
             |    ((CAST(l AS HUGEINT) * ub * ub % (CAST(d4 AS HUGEINT) * nb)) * 1000000000)
             |      // (CAST(d4 AS HUGEINT) * nb) ELSE 0 END AS t,
             |  na, nb, nn FROM w)
             |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             |  CAST((CAST(max(nn) AS HUGEINT) - 1) * sum(t) //
             |  (CAST(max(nn) AS HUGEINT) * max(nn)) AS BIGINT) AS ad_x1e9
             |FROM tm""".stripMargin.replace("\n", " "))),

    // Per-flag MEDIAN / MAD / Hampel-outlier summary — the robust
    // location/scale pair a curation pipeline uses where mean/stddev
    // would be owned by the very outliers it hunts. Both statistics
    // are TRUE order statistics ((n+1) DIV 2 rank, no interpolation)
    // found via TWO bucket-pruned Rank.globalWeightedMedian passes
    // (values, then |value − median| — the deviation table derives
    // from the pinned O(distinct) count table by broadcast join, never
    // a corpus rescan; each median windows only its target bucket);
    // all integer cents, engine-exact. outliers_n counts |x − med| > 5·MAD.
    QueryDef("stat13_mad_outliers",
      (s, dir) => {
        val b = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        graft.operators.Stats.madSummary(b, "g", "cents")
          .orderBy("g")
      },
      Some("""WITH r AS (SELECT l_returnflag AS g,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM lineitem),
             |cnt AS (SELECT g, v, count(*) AS c FROM r GROUP BY g, v),
             |tot AS (SELECT g, count(*) AS n FROM r GROUP BY g),
             |rm AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cnt),
             |med AS (SELECT rm.g, min(v) AS med FROM rm JOIN tot ON rm.g = tot.g
             |  WHERE cum >= (n + 1) // 2 GROUP BY rm.g),
             |dc AS (SELECT cnt.g AS g, abs(v - med) AS d, sum(c) AS c
             |  FROM cnt JOIN med ON cnt.g = med.g GROUP BY cnt.g, abs(v - med)),
             |rm2 AS (SELECT g, d, c, sum(c) OVER (PARTITION BY g ORDER BY d
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM dc),
             |mad AS (SELECT rm2.g, min(d) AS mad FROM rm2 JOIN tot ON rm2.g = tot.g
             |  WHERE cum >= (n + 1) // 2 GROUP BY rm2.g),
             |o AS (SELECT dc.g, sum(c) AS outliers FROM dc JOIN mad ON dc.g = mad.g
             |  WHERE d > 5 * mad GROUP BY dc.g)
             |SELECT tot.g AS g, CAST(n AS BIGINT) AS n, med AS median, mad,
             |  CAST(COALESCE(outliers, 0) AS BIGINT) AS outliers_n
             |FROM tot JOIN med ON tot.g = med.g JOIN mad ON tot.g = mad.g
             |LEFT JOIN o ON tot.g = o.g
             |ORDER BY tot.g""".stripMargin.replace("\n", " "))),

    // Wilcoxon signed-rank per flag — the PAIRED counterpart to stat6's
    // Mann-Whitney (same 1945 paper): pairs = each order's first vs
    // second line item, difference in price cents, grouped by the first
    // line's return flag. Average ranks at ties ride the ×2 integer
    // trick (avg-rank×2 of a tied block = 2·cum − c + 1), zero diffs
    // are dropped per Wilcoxon's procedure but COUNTED (n_zero), and
    // tie_term = Σ(t³−t) is emitted raw for the consumer's variance
    // correction — every column exact integer, engine-exact. One melt
    // to the O(distinct (flag, |d|)) count table (zeros ride the same
    // table at |d| = 0, folded out by per-group algebra — no second
    // corpus scan), ONE multi-series running count, one aggregate.
    QueryDef("stat14_wilcoxon_signed",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
        val a = li.filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("l_returnflag").as("g"),
            col("cents").as("ca"))
        val b = li.filter(col("l_linenumber") === 2)
          .select(col("l_orderkey"), col("cents").as("cb"))
        val pairs = a.join(b, "l_orderkey")
          .select(col("g"), (col("ca") - col("cb")).as("d"))
        graft.operators.Stats.wilcoxonSignedRank(pairs, "g", "d")
          .orderBy("g")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM lineitem),
             |pairs AS (SELECT a.l_returnflag AS g, a.cents - b.cents AS d
             |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |  WHERE a.l_linenumber = 1 AND b.l_linenumber = 2),
             |cnt AS (SELECT g, abs(d) AS ad, count(*) AS c,
             |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS p
             |  FROM pairs WHERE d <> 0 GROUP BY g, abs(d)),
             |rm AS (SELECT g, ad, c, p, sum(c) OVER (PARTITION BY g ORDER BY ad
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cnt),
             |agg AS (SELECT g, sum(c) AS n_pairs,
             |  sum(p * (2*cum - c + 1)) AS w_plus_x2,
             |  sum((c - p) * (2*cum - c + 1)) AS w_minus_x2,
             |  sum(CASE WHEN c > 1 THEN c*c*c - c ELSE 0 END) AS tie_term
             |  FROM rm GROUP BY g),
             |z AS (SELECT g, count(*) AS n_zero FROM pairs WHERE d = 0 GROUP BY g),
             |gs AS (SELECT DISTINCT g FROM pairs)
             |SELECT gs.g AS g, CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
             |  CAST(COALESCE(n_zero, 0) AS BIGINT) AS n_zero,
             |  CAST(COALESCE(w_plus_x2, 0) AS BIGINT) AS w_plus_x2,
             |  CAST(COALESCE(w_minus_x2, 0) AS BIGINT) AS w_minus_x2,
             |  CAST(COALESCE(tie_term, 0) AS BIGINT) AS tie_term
             |FROM gs LEFT JOIN agg ON gs.g = agg.g LEFT JOIN z ON gs.g = z.g
             |ORDER BY g""".stripMargin.replace("\n", " "))),

    // Kendall τ-b rank correlation (quantity vs discount cents) —
    // Spearman's sibling, counting pair AGREEMENTS: concordant /
    // discordant / tie counts are exact longs off ONE O(distinct-cell)
    // table and a bounded cell×cell dominance join (50 quantities × 11
    // discount levels ≈ 550 cells — the stat5 contingency-table
    // contract); τ-b itself is three IEEE ops on exactly-representable
    // integers, restated op-for-op by the oracle, so even the double is
    // bit-exact.
    QueryDef("stat15_kendall_tau",
      (s, dir) => {
        val b = t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          (dec(col("l_discount")) * 100).cast("long").as("y"))
        graft.operators.Stats.kendallTauB(b, "x", "y")
      },
      Some("""WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
             |  CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS y FROM lineitem),
             |cells AS (SELECT x, y, count(*) AS c FROM r GROUP BY x, y),
             |pq AS (SELECT CAST(COALESCE(sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS p,
             |  CAST(COALESCE(sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS q
             |  FROM cells a JOIN cells b ON b.x > a.x),
             |txx AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS tx
             |  FROM (SELECT sum(c) AS m FROM cells GROUP BY x)),
             |tyy AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS ty
             |  FROM (SELECT sum(c) AS m FROM cells GROUP BY y)),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
             |nz AS (SELECT n, n * (n - 1) // 2 AS n0 FROM nn)
             |SELECT n, p AS concordant, q AS discordant, tx AS ties_x, ty AS ties_y,
             |  round(CAST(p - q AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6) AS tau_b
             |FROM pq, txx, tyy, nz""".stripMargin.replace("\n", " "))),

    // Theil–Sen robust trend over the documents corpus: whitespace
    // word count vs character count in 10-char buckets — the robust-
    // regression slot next to stat2's OLS, on a pair with a REAL
    // monotone relation (corr ≈ 0.98 measured at every SF; the slope
    // ≈ 1.8 words per 10 chars robustly estimates mean word+space
    // length ≈ 5.5 chars, the length-normalization constant a text-
    // quality pipeline wants immune to a corrupt tail — Theil–Sen
    // shrugs off ~29% gross corruption where OLS moves with one row).
    // Slope = weighted median of pairwise slopes off ONE
    // O(distinct-cell) table and a bounded cell×cell dominance join
    // (the monotone band keeps the grid at ~260–480 cells across SFs —
    // the stat15 contract; the operator RAISES past 4096), intercept =
    // weighted median of residuals. Medians ride distributed weighted
    // prefix sums at rank (W+1) DIV 2; each pairwise slope is ONE
    // correctly-rounded IEEE division of exact longs, which both
    // engines state identically and which orders the rationals
    // faithfully (rounding is monotone), so the whole procedure is
    // engine-exact — the oracle replays it op for op.
    QueryDef("stat17_theil_sen",
      (s, dir) => {
        val b = t(s, dir, "documents").select(
          expr("n_chars DIV 10").as("x"),
          expr("length(text) - length(replace(text, ' ', '')) + 1").as("y"))
        graft.operators.Stats.theilSen(b, "x", "y")
      },
      Some("""WITH r AS (SELECT n_chars // 10 AS x,
             |  length(text) - length(replace(text, ' ', '')) + 1 AS y FROM documents),
             |cells AS (SELECT x, y, count(*) AS c FROM r GROUP BY x, y),
             |slopes AS (SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sd,
             |  CAST(sum(a.c * b.c) AS BIGINT) AS w
             |  FROM cells a JOIN cells b ON b.x > a.x GROUP BY sd),
             |wt AS (SELECT sum(w) AS wt FROM slopes),
             |cum AS (SELECT sd, sum(w) OVER (ORDER BY sd
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM slopes),
             |sl AS (SELECT min(sd) AS slope FROM cum, wt WHERE cw >= (wt + 1) // 2),
             |resid AS (SELECT CAST(y AS DOUBLE) - slope * CAST(x AS DOUBLE) AS rr, sum(c) AS c
             |  FROM cells, sl GROUP BY rr),
             |nn AS (SELECT sum(c) AS n FROM resid),
             |cum2 AS (SELECT rr, sum(c) OVER (ORDER BY rr
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM resid),
             |ic AS (SELECT min(rr) AS intercept FROM cum2, nn WHERE cw >= (n + 1) // 2)
             |SELECT CAST(nn.n AS BIGINT) AS n, CAST(wt.wt AS BIGINT) AS n_pairs,
             |  round(sl.slope, 6) AS slope, round(ic.intercept, 6) AS intercept
             |FROM nn, wt, sl, ic""".stripMargin.replace("\n", " "))),

    // Jonckheere–Terpstra ordered trend test — stat17's TEST sibling
    // (estimate vs test, the stat12/stat16 shared-cohort pairing):
    // ordered size cohorts (n_chars DIV 100) vs word count. Every
    // emitted column is an exact long: J*×2 with the mid-rank ×2 tie
    // trick, tied cross-pairs visible (u_tie), E[J*]×4 = n² − Σnᵢ²
    // from the same pinned cell table's marginals, and trend_x4 =
    // 2·j_x2 − e_j_x4 — the trend's sign/magnitude as a pure integer
    // (decisively positive here: longer docs have more words). One
    // bounded broadcast dominance join over the O(distinct cell)
    // table, the stat15 contract; the oracle replays every count.
    QueryDef("stat18_jonckheere",
      (s, dir) => {
        val b = t(s, dir, "documents").select(
          expr("n_chars DIV 100").as("g"),
          expr("length(text) - length(replace(text, ' ', '')) + 1").as("v"))
        graft.operators.Stats.jonckheereTerpstra(b, "g", "v")
      },
      Some("""WITH r AS (SELECT n_chars // 100 AS g,
             |  length(text) - length(replace(text, ' ', '')) + 1 AS v FROM documents),
             |cells AS (SELECT g, v, count(*) AS c FROM r GROUP BY g, v),
             |u AS (SELECT CAST(COALESCE(sum(CASE WHEN a.v < b.v THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS lt,
             |  CAST(COALESCE(sum(CASE WHEN a.v = b.v THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS tie
             |  FROM cells a JOIN cells b ON b.g > a.g),
             |m AS (SELECT CAST(sum(mm) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             |  CAST(sum(mm * mm) AS BIGINT) AS sq
             |  FROM (SELECT sum(c) AS mm FROM cells GROUP BY g))
             |SELECT n, k, 2 * lt + tie AS j_x2, tie AS u_tie,
             |  n * n - sq AS e_j_x4,
             |  2 * (2 * lt + tie) - (n * n - sq) AS trend_x4
             |FROM u, m""".stripMargin.replace("\n", " "))),

    // Wald SPRT replay per arm (the sequential face of the exp family):
    // H1 p=0.55 vs H0 p=0.45 on "order value >= $50", walked in
    // event_id order; the observed ~0.37 success rate drives both arms
    // to accept_h0 and the query reports WHERE each arm's walk crossed.
    // The LLR increments and Wald boundaries are quantized ×10⁹ ONCE
    // (Experiment.sprtConstants — the oracle interpolates the IDENTICAL
    // integers), so the walk is pure integer running sums: crossing
    // index, decision, and the LLR at the crossing are engine-exact.
    QueryDef("exp4_sprt",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("arm"),
            col("event_id"),
            ((dec(col("value")) * 100).cast("long") >= 5000L).as("big"))
        graft.operators.Experiment.sprt(b, "arm", "event_id", col("big"),
            p0 = 0.45, p1 = 0.55)
          .orderBy("arm")
      },
      Some {
        val (wS, wF, up, lo) = graft.operators.Experiment
          .sprtConstants(0.45, 0.55, 0.05, 0.05)
        s"""WITH b AS (SELECT user_id % 2 AS arm, event_id AS ord,
           |  CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5000
           |    THEN $wS ELSE $wF END AS w
           |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
           |rm AS (SELECT arm, ord, sum(w) OVER (PARTITION BY arm ORDER BY ord
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr FROM b),
           |x AS (SELECT arm, min(ord) AS at_order FROM rm
           |  WHERE llr >= $up OR llr <= $lo GROUP BY arm),
           |xx AS (SELECT x.arm, x.at_order, CAST(rm.llr AS BIGINT) AS llr_x1e9
           |  FROM x JOIN rm ON rm.arm = x.arm AND rm.ord = x.at_order),
           |n AS (SELECT arm, count(*) AS n FROM b GROUP BY arm)
           |SELECT n.arm, n.n,
           |  COALESCE(CASE WHEN llr_x1e9 >= $up THEN 'accept_h1'
           |    WHEN llr_x1e9 IS NOT NULL THEN 'accept_h0' END, 'continue') AS decision,
           |  xx.at_order, xx.llr_x1e9
           |FROM n LEFT JOIN xx ON n.arm = xx.arm
           |ORDER BY n.arm""".stripMargin.replace("\n", " ")
      }),

    // Benjamini–Hochberg FDR over a 256-test battery — the correction
    // layer above the drift family: per user-bucket p-values (quantized
    // ×10⁹; derived here from the bucket's cents sum by integer mod, so
    // both engines build the identical battery) with a planted signal —
    // buckets ≡ 0 (mod 16) get p < 0.0008 while every null bucket gets
    // p ≥ 0.1, so step-up at q = 0.05 provably rejects exactly the
    // planted 16 whatever the sums land on. The decision is pure
    // integer (p·m ≤ k·q_x1e9, cleared denominators), rejection is by
    // the threshold p (tie-safe), and the whole output — rank,
    // threshold decision, every accepted row — is SQL-replayed
    // verbatim.
    QueryDef("exp5_bh_fdr",
      (s, dir) => {
        val b = t(s, dir, "events")
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .groupBy(pmod(col("user_id"), lit(256)).cast("long").as("tid"))
          .agg(sum((dec(col("value")) * 100).cast("long")).as("s"))
          .select(col("tid"),
            when(col("tid") % 16 === 0L, pmod(col("s"), lit(800000L)))
              .otherwise(lit(100000000L) + pmod(col("s"), lit(800000000L)))
              .as("p"))
        graft.operators.Experiment.bhFdr(b, "tid", "p", qX1e9 = 50000000L)
          .orderBy("tid")
      },
      Some("""WITH b AS (SELECT user_id % 256 AS tid,
             |  sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s
             |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
             |  GROUP BY user_id % 256),
             |p AS (SELECT tid, CAST(CASE WHEN tid % 16 = 0
             |  THEN ((s % 800000) + 800000) % 800000
             |  ELSE 100000000 + ((s % 800000000) + 800000000) % 800000000 END AS BIGINT) AS p FROM b),
             |r AS (SELECT tid, p, row_number() OVER (ORDER BY p, tid) AS rk,
             |  count(*) OVER () AS m FROM p),
             |thr AS (SELECT max(p) AS t FROM r WHERE p * m <= rk * 50000000)
             |SELECT tid, p AS p_x1e9, rk AS p_rank,
             |  (t IS NOT NULL AND p <= t) AS rejected
             |FROM r, thr ORDER BY tid""".stripMargin.replace("\n", " ")))
  )
}
