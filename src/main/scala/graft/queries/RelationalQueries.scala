package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The implied-SQL operator surface (SURVEY.md §2.7): the reference exposes
  * "any SQL over the curated tables" through Athena; these queries exercise
  * that contract over the star-schema testdata — joins (broadcast + shuffle,
  * semi/anti), windows, sorts/top-k, set ops, rollup, subqueries.
  *
  * Scale notes are attached per query: dimension joins are explicitly
  * `broadcast()`-hinted (region/nation/supplier/part stay tiny at any SF;
  * broadcasting removes the shuffle of the 100 TB fact side entirely).
  */
object RelationalQueries {

  import QueryDef.t

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val all: Seq[QueryDef] = Seq(

    // Broadcast-hash join chain: fact(customer) ⋈ dims(nation, region).
    // Both dims broadcast — zero shuffle on the probe side at any scale.
    QueryDef("j1_broadcast_dim_join",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region_name"))
        .agg(count(lit(1)).as("customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
        .orderBy("region_name")
        .select(col("region_name"), col("customers"), col("total_acctbal")),
      Some("""SELECT r_name AS region_name, count(*) AS customers,
             |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY region_name""".stripMargin.replace("\n", " "))),

    // Large-side equi-join: orders ⋈ customer with group-by — the shuffle
    // join AQE manages; revenue per market segment.
    QueryDef("j2_fact_join_agg",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("orders_cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS orders_cnt,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replace("\n", " "))),

    // Semi join — EXISTS: customers that have at least one 'F'-status order.
    QueryDef("j3_semi_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') ORDER BY c_custkey")),

    // Anti join — NOT EXISTS: customers with no orders at all.
    QueryDef("j4_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),

    // Window — per-partition top-N via row_number (deterministic tiebreak).
    QueryDef("w1_window_topn",
      (s, dir) => t(s, dir, "customer")
        .withColumn("rn", row_number().over(
          Window.partitionBy("c_mktsegment")
            .orderBy(col("c_acctbal").desc, col("c_custkey"))))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_mktsegment", "rn"),
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
             |SELECT c_mktsegment, c_custkey, c_acctbal,
             |row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
             |FROM customer) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin.replace("\n", " "))),

    // Window — lag + running frame sum over event time per user (cast to
    // DECIMAL so the running reduction is exact).
    QueryDef("w2_window_running",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, dir, "events")
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("running_value",
            sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double"))
          .select("user_id", "event_id", "value", "prev_value", "running_value")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
             |FROM events ORDER BY user_id, event_id""".stripMargin.replace("\n", " "))),

    // As-of (backward) join: latest event per user at or before each
    // order's date — Spark lacks the operator; graft.operators.AsOf
    // implements the union/carry-forward pattern (one shuffle, no pair
    // blow-up). Timestamps compare as epoch micros on both engines
    // (DuckDB epoch_us truncates ns exactly like the loader's ts DIV 1000).
    QueryDef("j6_asof_join",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val events = t(s, dir, "events")
        graft.operators.AsOf.joinBackward(
          orders.select("o_orderkey", "o_custkey", "o_orderdate"), events,
          leftKey = "o_custkey", rightKey = "user_id",
          leftTs = unix_micros(col("o_orderdate").cast("timestamp")), rightTs = unix_micros(col("ts")),
          payload = Seq("event_id", "value"), tiebreak = col("event_id"))
          .select("o_orderkey", "event_id", "value")
          .orderBy("o_orderkey")
      },
      Some("""WITH u AS (
             |  SELECT user_id AS k, epoch_us(ts) AS uts, 1 AS is_r, event_id AS tb, event_id, value, NULL::BIGINT AS o_orderkey FROM events
             |  UNION ALL
             |  SELECT o_custkey, epoch_us(o_orderdate), 0, NULL, NULL, NULL, o_orderkey FROM orders),
             |w AS (SELECT *,
             |  last_value(event_id IGNORE NULLS) OVER win AS carry_eid,
             |  last_value(CASE WHEN is_r = 1 THEN value END IGNORE NULLS) OVER win AS carry_val
             |  FROM u WINDOW win AS (PARTITION BY k ORDER BY uts ASC, is_r DESC, tb ASC NULLS FIRST ROWS UNBOUNDED PRECEDING))
             |SELECT o_orderkey, carry_eid AS event_id, carry_val AS value FROM w WHERE is_r = 0 ORDER BY o_orderkey"""
        .stripMargin.replace("\n", " "))),

    // Sessionization: per-user session ids from event-time gaps > 30 min —
    // lag to detect session starts, running sum to number them. The batch
    // face of session windows; one shuffle on the user key.
    QueryDef("w4_sessionize",
      (s, dir) => {
        val uts = unix_micros(col("ts"))
        val w = Window.partitionBy("user_id").orderBy(uts, col("event_id"))
        t(s, dir, "events")
          .withColumn("new_session",
            when(uts - lag(uts, 1).over(w) > 1800L * 1000000L, 1L)
              .when(lag(uts, 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select("user_id", "event_id", "session_id")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS uts FROM events),
             |g AS (SELECT user_id, event_id, uts,
             |  CASE WHEN lag(uts, 1) OVER win IS NULL THEN 1
             |       WHEN uts - lag(uts, 1) OVER win > 1800000000 THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY uts, event_id))
             |SELECT user_id, event_id,
             |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |FROM g ORDER BY user_id, event_id""".stripMargin.replace("\n", " "))),

    // Tumbling event-time window over a batch relation — the batch face of
    // the streaming windowed aggregation (same window() semantics).
    QueryDef("w3_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("cnt"))
        .orderBy("day", "event_type"),
      Some("""SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
             |event_type, count(*) AS cnt FROM events
             |GROUP BY 1, event_type ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    // Sort / top-k — Spark plans TakeOrderedAndProject (no full sort shuffle).
    QueryDef("s1_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    // Set ops — INTERSECT/EXCEPT of user populations by event type.
    QueryDef("set1_intersect",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select("user_id")
          .intersect(e.filter(col("event_type") === "error").select("user_id"))
          .orderBy("user_id")
      },
      Some("SELECT user_id FROM events WHERE event_type = 'click' INTERSECT SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id")),

    QueryDef("set2_except",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.select("user_id").distinct()
          .except(e.filter(col("event_type") === "purchase").select("user_id"))
          .orderBy("user_id")
      },
      Some("SELECT DISTINCT user_id FROM events EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase' ORDER BY user_id")),

    // Rollup — multi-level aggregate in one pass.
    QueryDef("g1_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    // Correlated scalar subquery via join-reformulation + CTE shape:
    // orders above their customer's average order value. The average is
    // compared as `price * cnt > sum` so both engines decide boundaries on
    // exact decimal integers (DuckDB's avg() returns double; Spark's stays
    // decimal — a direct avg compare would diverge on rounding).
    QueryDef("sub1_above_avg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val per = o.groupBy(col("o_custkey").as("k"))
          .agg(sum(dec(col("o_totalprice"))).as("sum_price"), count(lit(1)).as("cnt"))
        o.join(per, col("o_custkey") === col("k"))
          .filter(dec(col("o_totalprice")) * col("cnt") > col("sum_price"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""WITH per AS (SELECT o_custkey AS k, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price, count(*) AS cnt FROM orders GROUP BY o_custkey)
             |SELECT o_orderkey, o_custkey, o_totalprice FROM orders JOIN per ON o_custkey = k
             |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt > sum_price ORDER BY o_orderkey""".stripMargin.replace("\n", " "))),

    // Left outer join: parts with their lineitem usage counts, keeping
    // never-ordered parts (NULL-extending side verified by the oracle).
    QueryDef("j5_left_outer",
      (s, dir) => t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_outer")
        .groupBy("p_partkey")
        .agg(sum(when(col("l_orderkey").isNotNull, 1L).otherwise(0L)).as("uses"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, CAST(coalesce(sum(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS uses
             |FROM part LEFT OUTER JOIN lineitem ON p_partkey = l_partkey
             |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin.replace("\n", " "))),

    // Cube: all grouping-set combinations in one pass.
    QueryDef("g2_cube",
      (s, dir) => t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST")),

    // UNION ALL across differently-filtered branches.
    QueryDef("set3_union_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select(col("event_id"), lit("c").as("tag"))
          .union(e.filter(col("value") > 90).select(col("event_id"), lit("v").as("tag")))
          .orderBy("event_id", "tag")
      },
      Some("""SELECT event_id, 'c' AS tag FROM events WHERE event_type = 'click'
             |UNION ALL SELECT event_id, 'v' AS tag FROM events WHERE value > 90
             |ORDER BY event_id, tag""".stripMargin.replace("\n", " "))),

    // The serving layer itself (SURVEY.md §3.4): ANSI SQL text over
    // registered tables via spark.sql — the Athena-equivalent surface.
    QueryDef("sql1_serving",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT n_name, count(*) AS suppliers, min(s_acctbal) AS min_bal
                |FROM supplier JOIN nation ON s_nationkey = n_nationkey
                |GROUP BY n_name ORDER BY n_name""".stripMargin)
      },
      Some("SELECT n_name, count(*) AS suppliers, min(s_acctbal) AS min_bal FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name")),

    // Approximate distinct (HLL++): order-insensitive sketch, so the
    // result is deterministic under any partitioning — but DuckDB's
    // approx_distinct is a different sketch, so this is a rows-only check;
    // the spec asserts relative error against the exact count.
    // HLL++ approximate distinct — oracle-checked via the ERROR BOUND:
    // the estimate's exact value is sketch-internal, but "within 10% of
    // the exact distinct count" (4x the default 2.5% relativeSD at these
    // cardinalities) is SQL. The oracle recomputes the exact counts and
    // pins the booleans TRUE.
    QueryDef("a5_approx_distinct",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("est"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est").cast("double") / col("exact_users").cast("double") - 1.0)
            <= 0.1).as("within_10pct"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |TRUE AS within_10pct FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Mergeable HLL rollup (Datasketches): per-type sketches built once,
    // the GLOBAL distinct estimate comes from hll_union_agg over the 5
    // sketch blobs — never a rescan of rows. This is the 100 TB rollup
    // pattern (pre-aggregate per partition/day, merge on demand); the
    // estimate itself is sketch-internal, so the oracle pins the exact
    // count and the error-bound boolean, a5's contract.
    QueryDef("a13_hll_union",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val perType = ev.groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        perType
          .agg(count(lit(1)).as("n_sketches"),
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
          .crossJoin(broadcast(ev.agg(countDistinct(col("user_id")).as("exact_users"))))
          .select(col("n_sketches"), col("exact_users"),
            (abs(col("est").cast("double") / col("exact_users").cast("double") - 1.0)
              <= 0.05).as("within_5pct"))
      },
      Some("""SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_sketches,
             |CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |TRUE AS within_5pct FROM events""".stripMargin.replace("\n", " "))),

    // Exact continuous percentiles (same (1-g)*a + g*b interpolation on
    // both engines — verified to the last bit on this data).
    QueryDef("a6_percentiles",
      (s, dir) => t(s, dir, "events")
        .agg(
          expr("percentile(value, 0.5)").as("p50_value"),
          expr("percentile(value, 0.9)").as("p90_value"),
          expr("percentile(value, 0.99)").as("p99_value")),
      Some("""SELECT quantile_cont(value, 0.5) AS p50_value,
             |quantile_cont(value, 0.9) AS p90_value,
             |quantile_cont(value, 0.99) AS p99_value FROM events""".stripMargin.replace("\n", " "))),

    // Grouped exact percentiles — the per-key distribution profile; one
    // partial-aggregated shuffle on the group key.
    QueryDef("a7_group_percentiles",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50_value"),
          expr("percentile(value, 0.9)").as("p90_value"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      Some("""SELECT event_type, quantile_cont(value, 0.5) AS p50_value,
             |quantile_cont(value, 0.9) AS p90_value, count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Mergeable t-digest sketch: constant-memory tail quantiles per group
    // (estimates are merge-order dependent → rows-only check; the error
    // bound vs exact percentile is pinned by SketchAggSpec).
    QueryDef("a8_tdigest",
      // Oracle-checked via the t-digest RANK-ERROR bound: the estimate's
      // exact value is engine-specific, but "est(q) lies between the
      // exact (q-eps) and (q+eps) quantiles" is SQL-expressible. The
      // Spark side emits the exact bounds (percentile ≡ quantile_cont,
      // bit-identical per a6) plus the containment booleans; the oracle
      // recomputes the bounds and pins the booleans TRUE. eps is sized
      // ~5× above the digest's observed rank error at compression=100,
      // tightening toward the tail as t-digest accuracy does (q(1-q)).
      (s, dir) => {
        val ex = expr("percentile(value, array(0.45D, 0.55D, 0.86D, 0.94D, 0.981D, 0.999D))")
        def okCol(est: Column, lo: Column, hi: Column): Column = est >= lo && est <= hi
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(graft.functions.TDigestFunctions.tdigest_quantiles(
            col("value"), Seq(0.5, 0.9, 0.99)).as("q"), ex.as("ex"))
          .select(col("event_type"),
            round(element_at(col("ex"), 1), 6).as("p50_lo"),
            round(element_at(col("ex"), 2), 6).as("p50_hi"),
            okCol(element_at(col("q"), 1), element_at(col("ex"), 1), element_at(col("ex"), 2)).as("p50_ok"),
            round(element_at(col("ex"), 3), 6).as("p90_lo"),
            round(element_at(col("ex"), 4), 6).as("p90_hi"),
            okCol(element_at(col("q"), 2), element_at(col("ex"), 3), element_at(col("ex"), 4)).as("p90_ok"),
            round(element_at(col("ex"), 5), 6).as("p99_lo"),
            round(element_at(col("ex"), 6), 6).as("p99_hi"),
            okCol(element_at(col("q"), 3), element_at(col("ex"), 5), element_at(col("ex"), 6)).as("p99_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |round(quantile_cont(value, 0.45), 6) AS p50_lo, round(quantile_cont(value, 0.55), 6) AS p50_hi, TRUE AS p50_ok,
             |round(quantile_cont(value, 0.86), 6) AS p90_lo, round(quantile_cont(value, 0.94), 6) AS p90_hi, TRUE AS p90_ok,
             |round(quantile_cont(value, 0.981), 6) AS p99_lo, round(quantile_cont(value, 0.999), 6) AS p99_hi, TRUE AS p99_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Misra-Gries heavy hitters: with k ≥ distinct items the summary is
    // exact (no decrements fire), so the bounded-memory aggregate is
    // oracle-checkable against plain groupBy counts here.
    QueryDef("a9_heavy_hitters",
      (s, dir) => t(s, dir, "documents")
        .agg(graft.functions.HeavyHittersFunctions.heavy_hitters(
          col("source"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy(desc("cnt"), col("item")),
      Some("""SELECT source AS item, count(*) AS cnt FROM documents
             |GROUP BY source ORDER BY cnt DESC, item""".stripMargin.replace("\n", " "))),

    // Count-Min sketch point frequencies — the OVERESTIMATE-only
    // companion to a9's Misra-Gries lower bounds: a fixed 4×64 counter
    // matrix per mapper (~2 KB shuffled regardless of how many distinct
    // items exist), elementwise-add merge, so the sketch is bit-identical
    // under any partitioning. The five event types are in the sketch's
    // exact regime (each gets a collision-free row — a property of the
    // strings alone, asserted by CountMinSpec), so the count(*) oracle
    // applies verbatim at any sf.
    QueryDef("a16_cms_counts",
      (s, dir) => t(s, dir, "events")
        .agg(graft.functions.CountMinFunctions.count_min(
          col("event_type"), 64, 4,
          Seq("click", "error", "purchase", "signup", "view")).as("cms"))
        .select(explode(col("cms")).as("e"))
        .select(col("e.item").as("item"), col("e.est_cnt").as("est_cnt"))
        .orderBy("item"),
      Some("""SELECT event_type AS item, count(*) AS est_cnt FROM events
             |GROUP BY 1 ORDER BY item""".stripMargin.replace("\n", " "))),

    // Second-moment statistics per group (corr / covariance / stddev /
    // variance) — one partial-aggregated shuffle; the merge step combines
    // per-partition (n, mean, M2, C2) summaries, so the reduction is
    // single-pass and constant-memory per group at any scale. The
    // combine order differs between engines, so results agree to ~1e-12
    // relative, not bitwise — both sides round to 6 decimals.
    QueryDef("stat1_moments",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_vu"),
          round(covar_pop(col("value"), col("user_id").cast("double")), 4).as("covar_vu"),
          round(stddev_samp(col("value")), 6).as("sd_value"),
          round(var_pop(col("value")), 6).as("var_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
             |ROUND(covar_pop(value, CAST(user_id AS DOUBLE)), 4) AS covar_vu,
             |ROUND(stddev_samp(value), 6) AS sd_value,
             |ROUND(var_pop(value), 6) AS var_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Fixed-width histogram: bucket by pure arithmetic (floor of the
    // scaled value), never a sort — one partial-aggregated shuffle keyed
    // on the bucket id. The double division is op-for-op identical on
    // both engines; null measures are excluded explicitly because the
    // engines order a null bucket differently.
    QueryDef("h1_histogram",
      (s, dir) => t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy((floor(col("value") / 10.0) * 10).cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket_lo"),
      Some("""SELECT CAST(FLOOR(value / 10.0) * 10 AS BIGINT) AS bucket_lo, count(*) AS n
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1 ORDER BY bucket_lo""".stripMargin.replace("\n", " "))),

    // Edit distance (levenshtein) — the fuzzy string-matching primitive;
    // all nation-name pairs, exact integer output.
    QueryDef("f7_levenshtein",
      (s, dir) => {
        val n = t(s, dir, "nation")
        n.select(col("n_nationkey").cast("long").as("a_key"), col("n_name").as("a_name"))
          .crossJoin(n.select(col("n_nationkey").cast("long").as("b_key"), col("n_name").as("b_name")))
          .filter(col("a_key") < col("b_key"))
          .select(col("a_key"), col("b_key"),
            levenshtein(col("a_name"), col("b_name")).cast("long").as("dist"))
          .orderBy("a_key", "b_key")
      },
      Some("""SELECT CAST(a.n_nationkey AS BIGINT) AS a_key, CAST(b.n_nationkey AS BIGINT) AS b_key,
             |CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
             |FROM nation a, nation b WHERE a.n_nationkey < b.n_nationkey
             |ORDER BY a_key, b_key""".stripMargin.replace("\n", " "))),

    // Pivot: long→wide per-user event-type counts (explicit value list so
    // the schema is static — the scalable form; discovery-pivot needs an
    // extra distinct pass).
    QueryDef("p9_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = t(s, dir, "events")
          .groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
        p.select(col("user_id") +: types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Unpivot: wide→long melt of lineitem metrics (map-only, no shuffle).
    // (orderkey, linenumber) is not unique in the testdata; value joins
    // the ORDER BY so identical-row ties are the only ambiguity.
    QueryDef("u1_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem WHERE l_orderkey % 10 = 0
             |UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey % 10 = 0
             |UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount FROM lineitem WHERE l_orderkey % 10 = 0
             |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin.replace("\n", " "))),

    // Range (interval-point) join via the bucketed reformulation — clicks
    // within one hour after each signup. The oracle states the naive theta
    // join; the engine must produce identical counts from the bucketed
    // equi-join plan (graft.operators.RangeJoin).
    QueryDef("r1_range_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val hourUs = 3600L * 1000000L
        val signups = e.filter(col("event_type") === "signup")
          .select(col("event_id"), unix_micros(col("ts")).as("lo"),
            (unix_micros(col("ts")) + hourUs).as("hi"))
        val clicks = e.filter(col("event_type") === "click")
          .select(unix_micros(col("ts")).as("t"))
        graft.operators.RangeJoin.intervalPointCount(signups, "event_id", clicks, "t", hourUs)
          .select(col("event_id"), col("matches").as("clicks_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT s.event_id, count(c.ts) AS clicks_1h
             |FROM events s LEFT JOIN events c ON c.event_type = 'click'
             |AND epoch_us(c.ts) >= epoch_us(s.ts) AND epoch_us(c.ts) < epoch_us(s.ts) + 3600000000
             |WHERE s.event_type = 'signup'
             |GROUP BY s.event_id ORDER BY s.event_id""".stripMargin.replace("\n", " "))),

    // Full outer join: both null-extending sides non-empty (filters
    // engineer the asymmetry — in this data every customer has orders).
    QueryDef("j7_full_outer",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") < 500)
          .select(col("c_custkey").as("ck"), col("c_name"))
        val o = t(s, dir, "orders").filter(col("o_custkey") > 300)
          .groupBy(col("o_custkey").as("ok")).agg(count(lit(1)).as("orders_cnt"))
        c.join(o, col("ck") === col("ok"), "full_outer")
          .select(coalesce(col("ck"), col("ok")).as("custkey"),
            coalesce(col("c_name"), lit("")).as("c_name"),
            coalesce(col("orders_cnt"), lit(0L)).as("orders_cnt"))
          .orderBy("custkey")
      },
      Some("""SELECT coalesce(ck, ok) AS custkey, coalesce(c_name, '') AS c_name,
             |CAST(coalesce(orders_cnt, 0) AS BIGINT) AS orders_cnt FROM
             |(SELECT c_custkey AS ck, c_name FROM customer WHERE c_custkey < 500) c
             |FULL OUTER JOIN
             |(SELECT o_custkey AS ok, count(*) AS orders_cnt FROM orders WHERE o_custkey > 300 GROUP BY o_custkey) o
             |ON ck = ok ORDER BY custkey""".stripMargin.replace("\n", " "))),

    // Ranking window family: rank/dense_rank/percent_rank over a
    // TIES-heavy ordering (status has 3 values) — exercises gap vs no-gap
    // rank semantics; ntile/row_number need the fully tiebroken order.
    QueryDef("w5_ranks",
      (s, dir) => {
        val wTies = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_orderstatus"))
        val wTotal = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_orderstatus"), col("o_orderkey"))
        t(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            rank().over(wTies).cast("long").as("rnk"),
            dense_rank().over(wTies).cast("long").as("drnk"),
            percent_rank().over(wTies).as("prnk"),
            row_number().over(wTotal).cast("long").as("rn"),
            ntile(4).over(wTotal).cast("long").as("quartile"))
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |CAST(rank() OVER wt AS BIGINT) AS rnk,
             |CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
             |percent_rank() OVER wt AS prnk,
             |CAST(row_number() OVER wo AS BIGINT) AS rn,
             |CAST(ntile(4) OVER wo AS BIGINT) AS quartile
             |FROM orders WHERE o_orderkey % 100 = 0
             |WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus),
             |wo AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus, o_orderkey)
             |ORDER BY o_orderpriority, rn""".stripMargin.replace("\n", " "))),

    // Sliding-frame window aggregation (moving sum/min/max over the last
    // 4 rows per user): decimal sums keep the frame reduction exact and
    // associative in both engines.
    QueryDef("w6_moving_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-3, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("mv_sum"),
            min(col("value")).over(w).as("mv_min"),
            max(col("value")).over(w).as("mv_max"),
            count(lit(1)).over(w).as("mv_n"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mv_sum,
             |min(value) OVER w AS mv_min,
             |max(value) OVER w AS mv_max,
             |count(*) OVER w AS mv_n
             |FROM events WHERE user_id < 50
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin.replace("\n", " "))),

    // Value-based RANGE window frame (vs w6's row-count frame): all
    // events whose event_id lies within 1000 of the current row's —
    // frame membership follows the ORDER value, not row positions, so
    // ties and gaps behave differently from ROWS (which is the point).
    QueryDef("w9_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rangeBetween(-1000, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("rg_sum"),
            count(lit(1)).over(w).as("rg_n"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rg_sum,
             |count(*) OVER w AS rg_n
             |FROM events WHERE user_id < 50
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin.replace("\n", " "))),

    // Distinct count (exact) + conditional aggregation.
    QueryDef("a4_distinct_conditional",
      (s, dir) => t(s, dir, "events")
        .agg(countDistinct(col("user_id")).as("users"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value")),
      Some("""SELECT count(DISTINCT user_id) AS users,
             |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             |max(value) AS max_value, min(value) AS min_value FROM events""".stripMargin.replace("\n", " "))),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicities — a different operator than the distinct forms of
    // set1/set2, with its own counted-intersection physical shape).
    QueryDef("set4_intersect_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("user_id") < 300).select("event_type")
          .intersectAll(e.filter(col("value") > 50).select("event_type"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type FROM (
             |SELECT event_type FROM events WHERE user_id < 300
             |INTERSECT ALL
             |SELECT event_type FROM events WHERE value > 50)
             |ORDER BY event_type""".stripMargin.replace("\n", " "))),

    QueryDef("set5_except_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("user_id") < 300).select("event_type")
          .exceptAll(e.filter(col("value") > 50).select("event_type"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type FROM (
             |SELECT event_type FROM events WHERE user_id < 300
             |EXCEPT ALL
             |SELECT event_type FROM events WHERE value > 50)
             |ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // LATERAL VIEW explode (the Hive-dialect generator syntax — the SQL
    // face of the G1 zip-flatten): split each comment into words, count
    // word occurrences per region.
    QueryDef("sql2_lateral_view",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT doc_id, w, count(*) AS cnt
                |FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
                |WHERE doc_id < 10 AND w <> '' GROUP BY doc_id, w
                |ORDER BY doc_id, w""".stripMargin)
      },
      Some("""SELECT doc_id, u.w AS w, count(*) AS cnt
             |FROM documents, unnest(string_split(text, ' ')) AS u(w)
             |WHERE doc_id < 10 AND u.w <> '' GROUP BY doc_id, u.w
             |ORDER BY doc_id, w""".stripMargin.replace("\n", " "))),

    // Recursive CTE (Spark 4's WITH RECURSIVE) — hierarchical ancestor
    // rollup over the derived part tree (parent = partkey DIV 10, a
    // 5-6 level acyclic hierarchy at any SF): every node's ancestor
    // chain is enumerated by the recursion (UNION ALL is safe — tree
    // paths never revisit a row), then descendants aggregate under
    // their single-digit root. The org-chart / BOM-explosion query
    // shape, expressed in the engine's own SQL surface and restated
    // verbatim in DuckDB (`//` for DIV). Money sums in DECIMAL, cast
    // to DOUBLE once at the end (exact → deterministic).
    QueryDef("sql3_recursive_rollup",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""WITH RECURSIVE anc(node, ancestor) AS (
                |  SELECT p_partkey, p_partkey DIV 10 FROM part WHERE p_partkey >= 10
                |  UNION ALL
                |  SELECT node, ancestor DIV 10 FROM anc WHERE ancestor >= 10
                |)
                |SELECT ancestor, count(*) AS n_desc,
                |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_price
                |FROM anc JOIN part ON node = p_partkey
                |WHERE ancestor BETWEEN 1 AND 9
                |GROUP BY ancestor ORDER BY ancestor""".stripMargin)
      },
      Some("""WITH RECURSIVE anc(node, ancestor) AS (
             |  SELECT p_partkey, p_partkey // 10 FROM part WHERE p_partkey >= 10
             |  UNION ALL
             |  SELECT node, ancestor // 10 FROM anc WHERE ancestor >= 10)
             |SELECT ancestor, count(*) AS n_desc,
             |CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_price
             |FROM anc JOIN part ON node = p_partkey
             |WHERE ancestor BETWEEN 1 AND 9
             |GROUP BY ancestor ORDER BY ancestor""".stripMargin.replace("\n", " "))),

    // Correlated LATERAL subquery: per region, its top-2 nations by
    // customer count — the correlated-derived-table surface (Catalyst
    // decorrelates into a ranked join).
    QueryDef("sub3_lateral",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT r_name, n_name, cnt FROM region,
                |LATERAL (SELECT n_name, count(*) AS cnt
                |         FROM nation JOIN customer ON c_nationkey = n_nationkey
                |         WHERE n_regionkey = r_regionkey
                |         GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) l
                |ORDER BY r_name, cnt DESC, n_name""".stripMargin)
      },
      Some("""SELECT r_name, n_name, cnt FROM region,
             |LATERAL (SELECT n_name, count(*) AS cnt
             |FROM nation JOIN customer ON c_nationkey = n_nationkey
             |WHERE n_regionkey = r_regionkey
             |GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) l
             |ORDER BY r_name, cnt DESC, n_name""".stripMargin.replace("\n", " "))),

    // Explicit GROUPING SETS (beyond rollup/cube): the hand-picked
    // combinations (type), (type, bucket), and grand total — one pass,
    // one shuffle, same as any grouped aggregate.
    QueryDef("g3_grouping_sets",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT event_type, user_id % 10 AS user_bucket,
                |count(*) AS cnt,
                |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM events
                |GROUP BY GROUPING SETS ((event_type), (event_type, user_id % 10), ())
                |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, user_id % 10 AS user_bucket, count(*) AS cnt,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (event_type, user_id % 10), ())
             |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin.replace("\n", " "))),

    // Correlated EXISTS subquery (decorrelated by Catalyst into a semi
    // join): customers with at least one urgent order but no account
    // balance above their nation's maximum.
    QueryDef("sub2_exists",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_name FROM customer
                |WHERE EXISTS (SELECT 1 FROM orders
                |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
                |  AND NOT EXISTS (SELECT 1 FROM orders
                |                  WHERE o_custkey = c_custkey AND o_totalprice > 500000)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 500000)
             |ORDER BY c_custkey""".stripMargin.replace("\n", " "))),

    // Sequential funnel (view → click → purchase, strictly ordered per
    // user): each stage is a filtered min-aggregate joined forward, all
    // three shuffles co-keyed on user_id. Timestamps compare as epoch
    // MICROS on both engines (Spark's native precision — the parquet ns
    // payload must never be compared raw).
    QueryDef("w8_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
        def stage(typ: String) = e.filter(col("event_type") === typ)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val tv = stage("view").groupBy("user_id").agg(min(col("us")).as("t_view"))
        val tc = stage("click").join(tv, "user_id")
          .filter(col("us") > col("t_view"))
          .groupBy("user_id").agg(min(col("us")).as("t_click"))
        val tp = stage("purchase").join(tc, "user_id")
          .filter(col("us") > col("t_click"))
          .groupBy("user_id").agg(min(col("us")).as("t_purchase"))
        tv.join(tc.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
          .join(tp.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L).otherwise(1L).as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH tv AS (SELECT user_id, min(epoch_us(ts)) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1),
             |tc AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click FROM events e JOIN tv USING (user_id)
             |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > t_view GROUP BY 1),
             |tp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase FROM events e JOIN tc USING (user_id)
             |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t_click GROUP BY 1)
             |SELECT tv.user_id, CAST(CASE WHEN tp.user_id IS NOT NULL THEN 3
             |WHEN tc.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
             |FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)
             |ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Time-series gap filling with last-observation-carried-forward: a
    // sparse user subset's daily totals, densified over each user's own
    // [min_day, max_day] calendar (sequence + explode — generated, not
    // stored), then LOCF via a running last(ignoreNulls) window. The
    // calendar generation is per-group and shuffle-free; only the final
    // window sorts, partitioned by user.
    QueryDef("w7_gap_fill",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("user_id") % 500 === 7)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("day_total"))
        val calendar = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        calendar.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            when(col("day_total").isNotNull, 1L).otherwise(0L).as("observed"),
            last(col("day_total"), ignoreNulls = true).over(w).cast("double").as("filled"))
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(CAST(value AS DECIMAL(18,2))) AS day_total
             |FROM events WHERE user_id % 500 = 7 GROUP BY 1, 2),
             |cal AS (SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
             |FROM daily GROUP BY user_id)
             |SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
             |CAST(CASE WHEN d.day_total IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed,
             |CAST(last_value(d.day_total IGNORE NULLS) OVER (PARTITION BY c.user_id ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled
             |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
             |ORDER BY c.user_id, day""".stripMargin.replace("\n", " "))),

    // Time-weighted average over irregular samples — the right mean for
    // sensor readings with uneven gaps (a plain avg over-weights bursts;
    // the reference's sensors are exactly such a feed). Each reading
    // holds its value until the next one (step interpolation); the
    // numerator Σ dt_µs·v_scaled stays EXACT integer arithmetic so the
    // result is partitioning-invariant, with one final double division.
    QueryDef("twa1_time_weighted_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .filter(col("user_id") < 30)
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 100).cast("long").as("v"))
          .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
          .withColumn("dt", col("next_us") - unix_micros(col("ts")))
          .filter(col("dt").isNotNull) // the last sample holds no interval
          .groupBy("user_id")
          .agg(sum(col("dt") * col("v")).as("num"), sum(col("dt")).as("den"))
          .select(col("user_id"), col("num"), col("den"),
            (col("num").cast("double") / col("den") / 100.0).as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS us, CAST(floor(value * 100) AS BIGINT) AS v,
             |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
             |  FROM events WHERE user_id < 30),
             |iv AS (SELECT user_id, v, next_us - us AS dt FROM r WHERE next_us IS NOT NULL)
             |SELECT user_id, CAST(sum(dt * v) AS BIGINT) AS num, CAST(sum(dt) AS BIGINT) AS den,
             |CAST(sum(dt * v) AS DOUBLE) / CAST(sum(dt) AS BIGINT) / 100.0 AS twa
             |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Correlated SCALAR subquery in the SELECT list — Catalyst
    // decorrelates it into a left outer aggregate join (no per-row
    // subquery execution); orders with no lineitems surface the
    // null-extension semantics.
    QueryDef("sub4_scalar_subquery",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey,
                |  (SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_qty,
                |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
                |FROM orders WHERE o_orderkey % 20 = 0
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |(SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_qty,
             |(SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
             |FROM orders WHERE o_orderkey % 20 = 0
             |ORDER BY o_orderkey""".stripMargin.replace("\n", " "))),

    // Null-safe equi-join (<=>): keys where NULL must MATCH NULL — the
    // join SQL's = can never express (NULL = NULL is NULL, dropping the
    // row). Spark plans EqualNullSafe as an ordinary hash join key.
    QueryDef("j8_null_safe_join",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"),
            when(col("event_id") % 5 === 0, lit(null)).otherwise(col("user_id")).as("k"))
        val groups = e.groupBy("k").agg(count(lit(1)).as("grp_n"))
        e.join(groups, e("k") <=> groups("k"))
          .select(col("event_id"), col("grp_n"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS k FROM events),
             |g AS (SELECT k, count(*) AS grp_n FROM e GROUP BY k)
             |SELECT event_id, grp_n FROM e JOIN g ON e.k IS NOT DISTINCT FROM g.k
             |ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Explicit CROSS JOIN (the only §2.7 join type without its own
    // query): the region × nation grid with a per-pair derived flag —
    // plans a BroadcastNestedLoopJoin over the tiny sides, which is the
    // right physical choice for an intentional cartesian of dims.
    QueryDef("cj1_cross_join",
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"),
          (col("n_regionkey") === col("r_regionkey")).as("is_home"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, n_regionkey = r_regionkey AS is_home
             |FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin.replace("\n", " "))),

    // Event-transition matrix: per-user event sequences (window lag over
    // the per-user order) folded into Markov transition counts — the
    // behavioral-model shape (bigram LM over event streams). One window
    // sort keyed per user + one partial-aggregated groupBy.
    QueryDef("seq1_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("transitions"))
          .orderBy("prev_type", "next_type")
      },
      Some("""SELECT prev_type, event_type AS next_type, count(*) AS transitions
             |FROM (SELECT user_id, event_type,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
             |  FROM events)
             |WHERE prev_type IS NOT NULL
             |GROUP BY prev_type, event_type
             |ORDER BY prev_type, next_type""".stripMargin.replace("\n", " "))),

    // Spatial radius self-join: sensors (md5-derived deterministic
    // coordinates per user) paired within planar distance 5 — grid-cell
    // bucketing turns the O(n²) theta join into an equi-join on cells
    // with a 3×3 neighborhood replication and exact recheck (the 2-D
    // RangeJoin; reference sensors carry lat/lon). The oracle recomputes
    // the identical coordinates and the naive pairwise form.
    QueryDef("geo1_radius_join",
      (s, dir) => {
        import graft.operators.{Geo, Sampling}
        val pts = t(s, dir, "events").select("user_id").distinct()
          .select(col("user_id"),
            (Sampling.hashValue(col("user_id"), "lat") % 100000 / lit(1000.0)).as("x"),
            (Sampling.hashValue(col("user_id"), "lon") % 100000 / lit(1000.0)).as("y"))
        Geo.radiusSelfJoin(pts, "user_id", "x", "y", radius = 5.0)
          .orderBy("a_id", "b_id")
      },
      Some("""WITH pts AS (SELECT DISTINCT user_id,
             |(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'lat'), 1, 8))::UBIGINT % 100000) / 1000.0 AS x,
             |(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'lon'), 1, 8))::UBIGINT % 100000) / 1000.0 AS y
             |FROM events)
             |SELECT a.user_id AS a_id, b.user_id AS b_id,
             |(a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
             |FROM pts a JOIN pts b ON a.user_id < b.user_id
             |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 25.0
             |ORDER BY a_id, b_id""".stripMargin.replace("\n", " "))),

    // Skyline / Pareto front: parts where no other part is both cheaper
    // and larger — the multi-criteria "best tradeoffs" operator (EDBT'23
    // "Integration of Skyline Queries into Spark SQL" framing). Two-phase
    // distributed: map-only per-partition fronts, then one global pass
    // over their union; the oracle is the NOT EXISTS dominance definition.
    QueryDef("sky1_skyline",
      (s, dir) => graft.operators.Skyline.skyline(
        t(s, dir, "part").select(col("p_partkey"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice")),
        Seq(("p_retailprice", true), ("p_size", false)))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice FROM part a
             |WHERE NOT EXISTS (SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
             |  AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
             |ORDER BY p_partkey""".stripMargin.replace("\n", " "))),

    // The same skyline through the CUSTOM CATALYST OPERATOR path
    // (SkylineNode logical plan → SkylineStrategy → SkylineExec physical
    // node) — proving the full LogicalPlan/Strategy/SparkPlan extension
    // stack end-to-end against the same oracle as sky1.
    QueryDef("sky2_skyline_exec",
      (s, dir) => graft.operators.Skyline.skylineExec(
        t(s, dir, "part").select(col("p_partkey"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice")),
        Seq(("p_retailprice", true), ("p_size", false)))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice FROM part a
             |WHERE NOT EXISTS (SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
             |  AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
             |ORDER BY p_partkey""".stripMargin.replace("\n", " "))),

    // TPC-H Q5 shape: the canonical 6-table star join — local supplier
    // volume per nation within one region and a date window. The plan the
    // engine should (and does) produce: the date filter pushes into the
    // orders scan; region→nation→supplier collapse into BROADCAST joins
    // (tiny dims), so only the two fact-fact joins (orders⋈customer,
    // lineitem⋈orders) shuffle; revenue sums run partial+final as exact
    // decimals. Join reorder + pushdown are Catalyst's — the query is
    // declared, not hand-scheduled.
    QueryDef("q5_star_join",
      (s, dir) => {
        val dec = (c: Column) => c.cast("decimal(18,2)")
        val asia = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        val nation = broadcast(t(s, dir, "nation").join(asia,
          col("n_regionkey") === col("r_regionkey")))
        val supplier = broadcast(t(s, dir, "supplier").join(nation,
          col("s_nationkey") === col("n_nationkey")))
        val orders = t(s, dir, "orders")
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        t(s, dir, "lineitem")
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(supplier,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             |AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |AND r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin.replace("\n", " "))),

    // Blocked fuzzy join (record linkage): a dirty probe set — customer
    // names with a deterministically deleted character — re-linked to
    // the master by suffix blocking + thresholded-Levenshtein verify.
    // Blocking turns the O(probe×master) distance cross join into an
    // equi-join whose quadratic verify runs only inside bounded blocks;
    // matches include each probe's true source (lev=1) plus realistic
    // accidental near-collisions the verify keeps honest.
    QueryDef("er1_fuzzy_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val probe = cust.filter(col("c_custkey") % 50 === 0)
          .select(col("c_custkey").as("d_key"),
            concat(substring(col("c_name"), 1, 9), expr("substring(c_name, 11)")).as("d_name"))
          .withColumn("blk", graft.operators.EntityResolution.suffixBlock(col("d_name"), 4))
        val master = cust
          .select(col("c_custkey").as("m_key"), col("c_name").as("m_name"))
          .withColumn("blk", graft.operators.EntityResolution.suffixBlock(col("m_name"), 4))
        graft.operators.EntityResolution.fuzzyJoin(
          probe, master, "blk", "d_name", "m_name", maxDist = 1)
          .select(col("d_key"), col("m_key"), col("lev").cast("long").as("lev"))
          .orderBy("d_key", "m_key")
      },
      Some("""WITH probe AS (SELECT c_custkey AS d_key,
             |substr(c_name, 1, 9) || substr(c_name, 11) AS d_name, right(substr(c_name, 1, 9) || substr(c_name, 11), 4) AS blk
             |FROM customer WHERE c_custkey % 50 = 0),
             |master AS (SELECT c_custkey AS m_key, c_name AS m_name, right(c_name, 4) AS blk FROM customer)
             |SELECT d_key, m_key, CAST(levenshtein(d_name, m_name) AS BIGINT) AS lev
             |FROM probe JOIN master USING (blk)
             |WHERE levenshtein(d_name, m_name) <= 1
             |ORDER BY d_key, m_key""".stripMargin.replace("\n", " "))),

    // Jaro-Winkler similarity (f7's levenshtein sibling — the census
    // record-linkage standard) via the custom codegen'd expression
    // graft.functions.JaroWinklerSim; all nation-name pairs, round-6
    // contract to absorb last-ulp float association differences.
    QueryDef("er2_jaro_winkler",
      (s, dir) => {
        val n = t(s, dir, "nation")
        n.select(col("n_nationkey").cast("long").as("a_key"), col("n_name").as("a_name"))
          .crossJoin(n.select(col("n_nationkey").cast("long").as("b_key"), col("n_name").as("b_name")))
          .filter(col("a_key") < col("b_key"))
          .select(col("a_key"), col("b_key"),
            round(graft.functions.JaroWinklerSim.jaro_winkler(
              col("a_name"), col("b_name")), 6).as("jw"))
          .orderBy("a_key", "b_key")
      },
      Some("""SELECT CAST(a.n_nationkey AS BIGINT) AS a_key, CAST(b.n_nationkey AS BIGINT) AS b_key,
             |ROUND(jaro_winkler_similarity(a.n_name, b.n_name), 6) AS jw
             |FROM nation a, nation b WHERE a.n_nationkey < b.n_nationkey
             |ORDER BY a_key, b_key""".stripMargin.replace("\n", " "))),

    // Linear-regression aggregate family (regr_slope / intercept / r2 /
    // count): price-on-quantity trend per return flag. Single-pass
    // partial-aggregated moments — one shuffle keyed on the group — so the
    // plan is identical in shape to stat1. Merge order differs between
    // engines (~1e-12 relative), so both sides round to 6 decimals, the
    // same contract stat1 uses.
    QueryDef("stat2_regression",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
             |ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
             |ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
             |ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    // Pearson correlation matrix of four lineitem measures in ONE
    // GramAgg pass (d(d+1)/2 exact longs per partition — the whole
    // matrix costs one scan). Columns are pre-scaled per-column so the
    // fixed-point moments stay inside int64; the cross-moment products
    // exceed int64 at sf0.1, so both engines promote (BigInt driver
    // math / HUGEINT) before the final correctly-rounded casts, sqrts,
    // and division — the only float ops, identical everywhere.
    QueryDef("stat3_corr_matrix",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select((col("l_quantity") * 100).as("c0"),
            col("l_extendedprice").as("c1"),
            (col("l_discount") * 10000).as("c2"),
            (col("l_tax") * 10000).as("c3"))
        graft.operators.Profile.correlationMatrix(
          li, Seq("c0", "c1", "c2", "c3"), scale = 1)
          .orderBy("i", "j")
      },
      Some {
        val exprs = Seq("l_quantity * 100", "l_extendedprice",
          "l_discount * 10000", "l_tax * 10000")
        val d = exprs.size
        def q(i: Int) = s"CAST(floor(${exprs(i)}) AS BIGINT)"
        val sums = (0 until d).map(i => s"sum(${q(i)}) AS s$i") ++
          (for (i <- 0 until d; j <- i until d)
            yield s"sum(CAST(${q(i)} AS HUGEINT) * ${q(j)}) AS p${i}_$j")
        val notNull = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(c => s"$c IS NOT NULL").mkString(" AND ")
        def p(i: Int, j: Int) = if (i <= j) s"p${i}_$j" else s"p${j}_$i"
        def dvar(i: Int) =
          s"(CAST(n AS HUGEINT) * ${p(i, i)} - CAST(s$i AS HUGEINT) * CAST(s$i AS HUGEINT))"
        val rows = (for (i <- 0 until d; j <- 0 until d) yield {
          val num = s"(CAST(n AS HUGEINT) * ${p(i, j)} - CAST(s$i AS HUGEINT) * CAST(s$j AS HUGEINT))"
          s"SELECT CAST($i AS BIGINT) AS i, CAST($j AS BIGINT) AS j, " +
            s"CASE WHEN ${dvar(i)} <= 0 OR ${dvar(j)} <= 0 THEN NULL " +
            s"ELSE round(CAST($num AS DOUBLE) / (sqrt(CAST(${dvar(i)} AS DOUBLE)) * sqrt(CAST(${dvar(j)} AS DOUBLE))), 6) END AS corr FROM m"
        }).mkString(" UNION ALL ")
        s"WITH m AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM lineitem WHERE $notNull) " +
          s"SELECT i, j, corr FROM ($rows) ORDER BY i, j"
      }),

    // Equi-depth histogram (vs h1's equi-width): EXACT quantile_cont
    // boundaries from Histograms.exactQuantiles — a histogram-refinement
    // pass (min/max/count, constant-state BinCountAgg, candidate-bin
    // re-read) instead of Spark's percentile, whose value→count buffer is
    // O(distinct values) and measured 2-3 s alone on sf0.1's 583 k
    // near-unique prices (the r8 bench regression). Bucket assignment is
    // then a literal-boundary codegen'd projection — never a global
    // sort/ntile, no broadcast join, no single-partition window. Data is
    // 2-decimal so a boundary ulp can never cross a value.
    QueryDef("h2_equidepth",
      (s, dir) => graft.operators.Histograms.equiDepth(
        t(s, dir, "lineitem"), col("l_extendedprice"), buckets = 8, exact = true)
        .select("bucket", "n", "lo", "hi")
        .orderBy("bucket"),
      Some("""WITH q AS (SELECT quantile_cont(l_extendedprice, [0.125,0.25,0.375,0.5,0.625,0.75,0.875]) AS qs FROM lineitem)
             |SELECT bucket, count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM (
             |SELECT l_extendedprice,
             |1 + CAST(l_extendedprice > qs[1] AS BIGINT) + CAST(l_extendedprice > qs[2] AS BIGINT)
             |+ CAST(l_extendedprice > qs[3] AS BIGINT) + CAST(l_extendedprice > qs[4] AS BIGINT)
             |+ CAST(l_extendedprice > qs[5] AS BIGINT) + CAST(l_extendedprice > qs[6] AS BIGINT)
             |+ CAST(l_extendedprice > qs[7] AS BIGINT) AS bucket
             |FROM lineitem, q) GROUP BY bucket ORDER BY bucket""".stripMargin.replace("\n", " "))),

    // Equi-depth via t-digest boundaries — the 100 TB default (exact
    // percentile state is O(distinct values); the digest's is constant).
    // ORACLE ON THE DEPTH BOUND (a8's rank-error pattern): boundary
    // values are digest-internal, but "every bucket holds 1/8 of the
    // rows ± two boundary rank errors" is SQL-stateable. Tolerance 0.02
    // absolute share; the observed worst bucket deviation at
    // compression 100 is 3e-4 at both sf0.01 and sf0.1, so the bound
    // has ~70× margin yet still fails a digest whose boundaries drift
    // off-rails (and a dropped bucket loses a row → rows mismatch).
    QueryDef("h3_equidepth_tdigest",
      (s, dir) => graft.operators.Histograms.equiDepth(
        t(s, dir, "lineitem"), col("l_extendedprice"), buckets = 8)
        .select(col("bucket"), (abs(col("share") - 0.125) <= 0.02).as("depth_ok"))
        .orderBy("bucket"),
      Some("SELECT r AS bucket, TRUE AS depth_ok FROM range(1, 9) t(r) ORDER BY bucket")),

    // Sweep-line interval analytics: treating each event as a 5-minute
    // activity interval, the max number simultaneously open and the total
    // covered time per event type — graft.operators.Intervals (unions of
    // +1/-1 deltas + one keyed window; no self-join, no pair blow-up).
    QueryDef("ivl1_concurrency",
      (s, dir) => {
        val winUs = 300L * 1000000L
        val iv = t(s, dir, "events").select(col("event_type"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + winUs).as("e_us"))
        graft.operators.Intervals
          .maxConcurrent(iv, col("s_us"), col("e_us"), Seq("event_type"))
          .join(graft.operators.Intervals
            .coveredMicros(iv, col("s_us"), col("e_us"), Seq("event_type")), Seq("event_type"))
          .orderBy("event_type")
      },
      Some("""WITH d AS (
             |SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
             |UNION ALL SELECT event_type, epoch_us(ts) + 300000000, -1 FROM events),
             |r AS (SELECT event_type, t, delta,
             |sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open,
             |lead(t) OVER (PARTITION BY event_type ORDER BY t, delta) AS next_t FROM d)
             |SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent,
             |CAST(sum(CASE WHEN open > 0 AND next_t IS NOT NULL THEN next_t - t ELSE 0 END) AS BIGINT) AS covered_us
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Population stability index (PSI) — the model-monitoring drift
    // metric: decile bins from the REFERENCE window's exact percentiles
    // (a6-proven bit parity), both windows bucketed map-side against the
    // broadcast boundary row, one count aggregate each, PSI contribution
    // (p−q)·ln(p/q) per bin. Complements drift1's schema-level deltas
    // with a distribution-level signal.
    QueryDef("drift2_psi",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("value"), dayofmonth(col("ts")).as("dy"))
        val ref = ev.filter(col("dy") <= 15)
        val cur = ev.filter(col("dy") > 15)
        val qs = ref.agg(expr(
          "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("qs"))
        def bucketed(df: org.apache.spark.sql.DataFrame) = {
          val b = (1 to 9)
            .map(i => (col("value") > element_at(col("qs"), i)).cast("long"))
            .reduce(_ + _) + lit(1L)
          df.crossJoin(broadcast(qs)).groupBy(b.as("bin"))
            .agg(count(lit(1)).as("n"))
        }
        val r = bucketed(ref).withColumnRenamed("n", "n_ref")
        val c = bucketed(cur).withColumnRenamed("n", "n_cur")
        r.join(c, Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur"))
          .crossJoin(broadcast(ref.agg(count(lit(1)).as("tr"))))
          .crossJoin(broadcast(cur.agg(count(lit(1)).as("tc"))))
          .select(col("bin"), col("n_ref"), col("n_cur"), {
            // standard PSI zero-bin guard: clamp each proportion at 1e-6
            // so empty bins contribute a large-but-finite term instead of
            // NULL (Spark) / ±Inf (DuckDB); no-op for populated deciles
            val p = greatest(
              col("n_ref").cast("double") / col("tr").cast("double"), lit(1e-6))
            val q = greatest(
              col("n_cur").cast("double") / col("tc").cast("double"), lit(1e-6))
            round((p - q) * log(p / q), 6).as("psi_contrib")
          })
          .orderBy("bin")
      },
      Some("""WITH ev AS (SELECT value, day(ts) AS dy FROM events WHERE value IS NOT NULL),
             |ref AS (SELECT value FROM ev WHERE dy <= 15),
             |cur AS (SELECT value FROM ev WHERE dy > 15),
             |q AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM ref),
             |rb AS (SELECT 1 + CAST(value > qs[1] AS BIGINT) + CAST(value > qs[2] AS BIGINT) + CAST(value > qs[3] AS BIGINT)
             |+ CAST(value > qs[4] AS BIGINT) + CAST(value > qs[5] AS BIGINT) + CAST(value > qs[6] AS BIGINT)
             |+ CAST(value > qs[7] AS BIGINT) + CAST(value > qs[8] AS BIGINT) + CAST(value > qs[9] AS BIGINT) AS bin
             |FROM ref, q),
             |cb AS (SELECT 1 + CAST(value > qs[1] AS BIGINT) + CAST(value > qs[2] AS BIGINT) + CAST(value > qs[3] AS BIGINT)
             |+ CAST(value > qs[4] AS BIGINT) + CAST(value > qs[5] AS BIGINT) + CAST(value > qs[6] AS BIGINT)
             |+ CAST(value > qs[7] AS BIGINT) + CAST(value > qs[8] AS BIGINT) + CAST(value > qs[9] AS BIGINT) AS bin
             |FROM cur, q),
             |rc AS (SELECT bin, count(*) AS n_ref FROM rb GROUP BY bin),
             |cc AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY bin)
             |SELECT coalesce(rc.bin, cc.bin) AS bin,
             |CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
             |CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
             |ROUND((greatest(CAST(coalesce(n_ref, 0) AS DOUBLE) / (SELECT count(*) FROM ref), 1e-6) -
             |greatest(CAST(coalesce(n_cur, 0) AS DOUBLE) / (SELECT count(*) FROM cur), 1e-6)) *
             |ln(greatest(CAST(coalesce(n_ref, 0) AS DOUBLE) / (SELECT count(*) FROM ref), 1e-6) /
             |greatest(CAST(coalesce(n_cur, 0) AS DOUBLE) / (SELECT count(*) FROM cur), 1e-6)), 6) AS psi_contrib
             |FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin
             |ORDER BY bin""".stripMargin.replace("\n", " "))),

    // Referential-integrity expectation (Validation.referentialIntegrity):
    // one passing FK (events.user_id ⊆ customer keys) and one engineered
    // violation (parent truncated to keys > 50) so the orphan counting is
    // observed non-trivially, not just a 0-orphans success row.
    QueryDef("a12_ref_integrity",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cust = t(s, dir, "customer")
        val ok = graft.operators.Validation
          .referentialIntegrity(ev, "user_id", cust, "c_custkey")
          .withColumn("check_name", lit("fk_events_customer"))
        val bad = graft.operators.Validation
          .referentialIntegrity(ev, "user_id",
            cust.filter(col("c_custkey") > 50), "c_custkey")
          .withColumn("check_name", lit("fk_events_customer_gt50"))
        ok.unionByName(bad)
          .select(col("check_name"), col("total_rows"), col("null_keys"),
            col("orphan_rows"), col("orphan_keys"), col("success"))
          .orderBy("check_name")
      },
      Some("""SELECT 'fk_events_customer' AS check_name,
             |(SELECT count(*) FROM events) AS total_rows,
             |(SELECT count(*) FROM events WHERE user_id IS NULL) AS null_keys,
             |(SELECT count(*) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS orphan_rows,
             |(SELECT count(DISTINCT e.user_id) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS orphan_keys,
             |(SELECT count(*) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) = 0 AS success
             |UNION ALL SELECT 'fk_events_customer_gt50',
             |(SELECT count(*) FROM events),
             |(SELECT count(*) FROM events WHERE user_id IS NULL),
             |(SELECT count(*) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND c.c_custkey > 50)),
             |(SELECT count(DISTINCT e.user_id) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND c.c_custkey > 50)),
             |(SELECT count(*) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND c.c_custkey > 50)) = 0
             |ORDER BY check_name""".stripMargin.replace("\n", " "))),

    // Golden-record survivorship (entity resolution's last step): per
    // entity keep ONE record by rule priority — non-null measure first,
    // then latest, then highest id. A struct-max ARGMAX: one partial-
    // aggregated shuffle, no window sort over the corpus (max_by with a
    // deterministic composite key).
    QueryDef("er3_survivorship",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t_us"), col("value"))
        .groupBy("user_id")
        .agg(max(struct(col("value").isNotNull.cast("int").as("nn"),
          col("t_us"), col("event_id"))).as("best"))
        .select(col("user_id"), col("best.event_id").as("event_id"),
          col("best.t_us").as("t_us"))
        .orderBy("user_id"),
      Some("""SELECT user_id, event_id, t_us FROM (
             |SELECT user_id, event_id, epoch_us(ts) AS t_us,
             |row_number() OVER (PARTITION BY user_id
             |ORDER BY (value IS NOT NULL) DESC, epoch_us(ts) DESC, event_id DESC) AS rn
             |FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Cumulative distinct users by day (growth accounting): first-seen
    // date per user (one partial-agg shuffle over users), daily counts,
    // then the running sum over a relation that is O(days) — the window
    // is over ~thousands of rows AFTER aggregation, so "cumulative
    // distinct" never needs a distinct-over-window on the event log.
    QueryDef("w11_cumulative_users",
      (s, dir) => {
        val fs = t(s, dir, "events").filter(col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("day"))
        val daily = fs.groupBy("day").agg(count(lit(1)).as("new_users"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        daily.withColumn("cum_users", sum(col("new_users")).over(w))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
             |FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
             |dc AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day)
             |SELECT day, CAST(new_users AS BIGINT) AS new_users,
             |CAST(sum(new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM dc ORDER BY day""".stripMargin.replace("\n", " "))),

    // TPC-H Q3 shape (shipping priority): segment-filtered 3-way join,
    // decimal-exact revenue aggregation (q1's discipline: price ×
    // (1−discount) in DECIMAL, associative and engine-exact), top-10 by
    // the EXACT decimal with orderkey tiebreak — TakeOrderedAndProject
    // over a broadcast customer dim + fact join, never a global sort.
    QueryDef("q3_shipping_priority",
      (s, dir) => {
        val cut = "1998-06-01"
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("rev"))
          .orderBy(col("rev").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("rev").cast("double").as("revenue"),
            col("o_date"), col("o_orderpriority"))
      },
      Some("""SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue, o_date, o_orderpriority FROM (
             |SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
             |sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
             |GROUP BY 1, 2, 3 ORDER BY rev DESC, l_orderkey LIMIT 10)
             |ORDER BY revenue DESC, l_orderkey""".stripMargin.replace("\n", " "))),

    // Exact per-group mode (most frequent value, deterministic ties:
    // highest count then smallest value) — the categorical/discrete
    // summary `avg` can't give. Two partial-aggregated shuffles
    // ((key, value) counts, then a struct-argmax per key — er3's
    // pattern, no window sort); values ride as ×100 longs so the
    // negated tie-break field is exact (a double negation would emit
    // -0.0). Oracle: row_number formulation.
    QueryDef("a14_mode",
      (s, dir) => t(s, dir, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("vs"))
        .groupBy("event_type", "vs").agg(count(lit(1)).as("cnt"))
        .groupBy("event_type")
        .agg(max(struct(col("cnt"), (-col("vs")).as("nv"))).as("best"))
        .select(col("event_type"), col("best.cnt").as("n_mode"),
          (-col("best.nv")).as("mode_x100"))
        .orderBy("event_type"),
      Some("""WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vs, count(*) AS cnt
             |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT event_type, vs, cnt,
             |row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, vs) AS rn FROM c)
             |SELECT event_type, CAST(cnt AS BIGINT) AS n_mode, vs AS mode_x100
             |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // OHLC candle rollup per (event_type, hour): open/close via the
    // struct-argmin/argmax trick (er3's pattern — one partial-aggregated
    // shuffle, deterministic (ts, id) tie-break, never a window sort
    // over the corpus), high/low/n as plain aggregates. The time-series
    // summary every monitoring rollup runs. Values are 2-decimal, so
    // they ride exactly; the oracle uses row_number windows for the
    // endpoints.
    QueryDef("w10_ohlc",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("value").isNotNull && col("event_type").isNotNull)
          .select(col("event_type"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("t_us"),
            (unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(3600000000L)))
              .as("hour_us"))
        ev.groupBy("event_type", "hour_us")
          .agg(
            min(struct(col("t_us"), col("event_id"), col("value")))
              .getField("value").as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(struct(col("t_us"), col("event_id"), col("value")))
              .getField("value").as("close"),
            count(lit(1)).as("n"))
          .orderBy("event_type", "hour_us")
      },
      Some("""WITH ev AS (SELECT event_type, event_id, value, epoch_us(ts) AS t_us,
             |epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us
             |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |r AS (SELECT event_type, hour_us, value,
             |row_number() OVER (PARTITION BY event_type, hour_us ORDER BY t_us, event_id) AS ra,
             |row_number() OVER (PARTITION BY event_type, hour_us ORDER BY t_us DESC, event_id DESC) AS rd
             |FROM ev)
             |SELECT event_type, hour_us,
             |max(CASE WHEN ra = 1 THEN value END) AS open,
             |max(value) AS high, min(value) AS low,
             |max(CASE WHEN rd = 1 THEN value END) AS close,
             |count(*) AS n
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // k-anonymity audit (graft.operators.Privacy): does any quasi-
    // identifier combination — segment × nation × balance-sign —
    // identify fewer than k customers? One hash-aggregate shuffle keyed
    // on the combo; state is O(combinations), never O(rows).
    QueryDef("priv1_kanonymity",
      (s, dir) => graft.operators.Privacy.kAnonymityAudit(
        t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey"),
          (col("c_acctbal") < 0).as("neg_bal")),
        Seq("c_mktsegment", "c_nationkey", "neg_bal"), k = 5),
      Some("""WITH g AS (SELECT c_mktsegment, c_nationkey, (c_acctbal < 0) AS neg_bal,
             |count(*) AS group_rows FROM customer GROUP BY 1, 2, 3)
             |SELECT CAST(count(*) AS BIGINT) AS n_groups,
             |CAST(sum(CASE WHEN group_rows < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
             |CAST(sum(CASE WHEN group_rows < 5 THEN group_rows ELSE 0 END) AS BIGINT) AS rows_at_risk,
             |CAST(min(group_rows) AS BIGINT) AS min_group_rows
             |FROM g""".stripMargin.replace("\n", " "))),

    // Winsorization: clip values into the per-group [p05, p95] band —
    // the standard robust-statistics pre-step. Exact percentiles (one
    // keyed aggregate, a6/a7-proven bit parity with quantile_cont) ride
    // a broadcast join back onto the rows; the clip itself is map-only.
    QueryDef("p10_winsorize",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
        val qs = ev.groupBy("event_type").agg(
          expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
        ev.join(broadcast(qs), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            least(greatest(col("value"), col("lo")), col("hi")).as("winsorized"))
          .orderBy("event_id")
      },
      Some("""WITH q AS (SELECT event_type, quantile_cont(value, 0.05) AS lo,
             |quantile_cont(value, 0.95) AS hi FROM events WHERE value IS NOT NULL GROUP BY event_type)
             |SELECT event_id, e.event_type, value, least(greatest(value, lo), hi) AS winsorized
             |FROM events e JOIN q ON e.event_type = q.event_type
             |WHERE e.value IS NOT NULL ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Market-basket association mining: co-purchased part pairs with
    // support and lift. Pairs come from the basket-explode formulation
    // (Graph.cooccurrencePairs: one shuffle on the order key, pairs
    // generated map-side, bounded by basket² ≈ 4² per order — never the
    // self-join's second scan+shuffle); singleton counts and the order
    // total ride broadcast joins, so no driver-side count action.
    QueryDef("mba1_lift",
      (s, dir) => {
        // Round-17 shrink-then-pin (the VERDICT-prescribed successor to
        // the round-16 revert): the OLD multi-consumer point was the
        // near-corpus-size (ok, pk) distinct — pinning it inverted at
        // 10× data, so it stayed unpinned and the plan carried eight
        // 2-column lineitem re-scans. The basket aggregation subsumes
        // that distinct (collect_set dedups), and the pinned relation is
        // now O(orders) rows of a small sorted array — strictly smaller
        // than its recompute input, recompute crosses a shuffle: the pin
        // rule's YES profile. Every consumer (pair explosion, singleton
        // counts, order total) derives from the pin, so lineitem is
        // scanned ONCE and the (ok, pk) distinct exchange is gone.
        // Equivalence: baskets hold the DISTINCT pk set per order, so
        // exploding them = the old `op`; n_orders = basket count because
        // l_partkey is never null (the cooccurrencePairs null filter
        // drops no rows — oracle-pinned at both SFs).
        val bk = graft.operators.Materialize(graft.operators.Graph
          .basketSets(t(s, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")),
            "ok", "pk"))
        val nOrders = bk.agg(count(lit(1)).as("n_orders"))
        val item = bk.select(explode(col("basket")).as("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
        // widen: AQE coalesces the small pinned basket relation to ~1
        // partition, which would serialize the heavy pair explosion +
        // partial aggregation through one task (the samp8/t19 shape —
        // Rounds.widen's guard adds no exchange on a real wide input)
        val pairs = graft.operators.Graph
          .basketPairs(graft.operators.Rounds.widen(bk), "basket")
          .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
        pairs
          .join(broadcast(item.select(col("pk").as("pa"), col("cnt").as("ca"))), "pa")
          .join(broadcast(item.select(col("pk").as("pb"), col("cnt").as("cb"))), "pb")
          .crossJoin(broadcast(nOrders))
          .select(col("pa"), col("pb"), col("support"),
            round((col("support") * col("n_orders")).cast("double") /
              (col("ca") * col("cb")).cast("double"), 6).as("lift"))
          .orderBy("pa", "pb")
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
             |item AS (SELECT pk, count(*) AS cnt FROM op GROUP BY pk),
             |pairs AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS support
             |FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT pa, pb, CAST(support AS BIGINT) AS support,
             |ROUND(CAST(support * n_orders AS DOUBLE) / CAST(ia.cnt * ib.cnt AS DOUBLE), 6) AS lift
             |FROM pairs CROSS JOIN n JOIN item ia ON pairs.pa = ia.pk JOIN item ib ON pairs.pb = ib.pk
             |ORDER BY pa, pb""".stripMargin.replace("\n", " "))),

    // Cohort retention: users grouped by first-PURCHASE week, distinct
    // purchasing users per (cohort, week offset) — the standard growth
    // analytics matrix. Purchases (not all events) so cohorts actually
    // spread across weeks instead of collapsing into week 1. Two
    // shuffles: first-touch argmin per user, then one distinct-count
    // aggregate; both keyed, no window over the corpus.
    QueryDef("coh1_retention",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
        val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
        ev.join(cohort, "user_id")
          .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events WHERE event_type = 'purchase'),
             |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
             |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
             |CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_offset,
             |CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
             |FROM ev JOIN cohort ON ev.user_id = cohort.user_id
             |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin.replace("\n", " "))),

    // Exact triangle count over the co-purchase graph via degree
    // orientation (graft.operators.Graph — wedges bounded O(|E|^1.5)
    // regardless of skew, where the oracle's naive 3-way self-join is
    // quadratic in max degree; counts are provably identical).
    QueryDef("graph1_triangles",
      (s, dir) => {
        // No (ok, pk) pre-distinct (round-17): cooccurrencePairs'
        // collect_set dedups per basket, so feeding the raw filtered
        // fact rows yields identical edges one full exchange cheaper.
        val op = t(s, dir, "lineitem").filter(col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = graft.operators.Graph.cooccurrencePairs(op, "ok", "pk")
          .select(col("pa").as("u"), col("pb").as("v")).distinct()
        // materialize: the oriented edges feed three differently-keyed
        // joins (ReuseExchange can't dedup), and here the whole
        // co-occurrence pair generation sits upstream of them — pinning
        // |E| rows beats re-running it twice more (measured 2.9→2.1 s
        // warm at sf0.1, identical count)
        graft.operators.Graph.triangleCount(edges, "u", "v",
          materializeOriented = true)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0),
             |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
             |SELECT CAST(count(*) AS BIGINT) AS n_triangles
             |FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin.replace("\n", " "))),

    // Fixed-point PageRank (3 iterations, damping 85/100, dangling mass
    // redistributed) over a directed supplier→part / part→supplier graph
    // from disjoint lineitem slices — the authority-weighting signal a
    // crawl-curation pipeline ranks web domains with. All-integer
    // arithmetic makes the ranks EXACT (no float reduction-order drift),
    // so the DuckDB oracle unrolls the same three iterations as CTEs and
    // matches hash-exact. Suppliers offset by 1e6 to keep the two key
    // spaces disjoint.
    QueryDef("graph2_pagerank",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sp = li.filter(col("l_orderkey") % 7 === 0)
          .select((col("l_suppkey") + 1000000).cast("long").as("src"),
            col("l_partkey").cast("long").as("dst"))
        val ps = li.filter(col("l_orderkey") % 7 === 1)
          .select(col("l_partkey").cast("long").as("src"),
            (col("l_suppkey") + 1000000).cast("long").as("dst"))
        graft.operators.Graph.pageRank(sp.unionByName(ps), "src", "dst",
            iterations = 3)
          .orderBy("id")
      },
      Some("""WITH e AS (
             |SELECT DISTINCT CAST(l_suppkey + 1000000 AS BIGINT) AS src, CAST(l_partkey AS BIGINT) AS dst FROM lineitem WHERE l_orderkey % 7 = 0
             |UNION
             |SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, CAST(l_suppkey + 1000000 AS BIGINT) AS dst FROM lineitem WHERE l_orderkey % 7 = 1),
             |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |nn AS (SELECT count(*) AS n, 1000000000 // count(*) AS base FROM nodes),
             |od AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
             |r0 AS (SELECT id, (SELECT base FROM nn) AS r FROM nodes),
             |d1 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r0 r LEFT JOIN od ON r.id = od.id WHERE od.id IS NULL),
             |i1 AS (SELECT e.dst AS id, sum(r.r // od.deg) AS inflow FROM e JOIN r0 r ON e.src = r.id JOIN od ON e.src = od.id GROUP BY e.dst),
             |r1 AS (SELECT n.id, (15 * nn.base + 85 * (coalesce(i1.inflow, 0) + d1.dang // nn.n)) // 100 AS r
             |FROM nodes n CROSS JOIN nn CROSS JOIN d1 LEFT JOIN i1 ON n.id = i1.id),
             |d2 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r1 r LEFT JOIN od ON r.id = od.id WHERE od.id IS NULL),
             |i2 AS (SELECT e.dst AS id, sum(r.r // od.deg) AS inflow FROM e JOIN r1 r ON e.src = r.id JOIN od ON e.src = od.id GROUP BY e.dst),
             |r2 AS (SELECT n.id, (15 * nn.base + 85 * (coalesce(i2.inflow, 0) + d2.dang // nn.n)) // 100 AS r
             |FROM nodes n CROSS JOIN nn CROSS JOIN d2 LEFT JOIN i2 ON n.id = i2.id),
             |d3 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r2 r LEFT JOIN od ON r.id = od.id WHERE od.id IS NULL),
             |i3 AS (SELECT e.dst AS id, sum(r.r // od.deg) AS inflow FROM e JOIN r2 r ON e.src = r.id JOIN od ON e.src = od.id GROUP BY e.dst),
             |r3 AS (SELECT n.id, (15 * nn.base + 85 * (coalesce(i3.inflow, 0) + d3.dang // nn.n)) // 100 AS r
             |FROM nodes n CROSS JOIN nn CROSS JOIN d3 LEFT JOIN i3 ON n.id = i3.id)
             |SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM r3 ORDER BY id""".stripMargin.replace("\n", " "))),

    // Fixed-point EWMA smoothing per user (α = 1/4): each output depends
    // on the previous OUTPUT — no window frame can express it, so the
    // operator is a secondary-sorted sequential pass (O(1) state per
    // partition, never a per-key buffer). Integer recurrence
    // e = (x + 3e) div 4 on ×100-scaled values → the oracle replays it
    // with a recursive CTE over the identical (ts, id) order.
    QueryDef("ewma1_sensor_smooth",
      (s, dir) => graft.operators.Timeseries.ewmaSmooth(
        t(s, dir, "events"), "user_id", "ts", "event_id", "value",
        alphaDen = 4, scale = 100)
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE s AS MATERIALIZED (SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS xs,
             |row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
             |r AS (SELECT user_id, event_id, xs, rn, xs AS e FROM s WHERE rn = 1
             |UNION ALL SELECT s.user_id, s.event_id, s.xs, s.rn, (s.xs + 3 * r.e) // 4
             |FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
             |SELECT user_id, event_id, xs AS v_scaled, CAST(e AS BIGINT) AS ewma_scaled
             |FROM r ORDER BY user_id, event_id""".stripMargin.replace("\n", " "))),

    // Fixed-round k-core pruning over the same supplier–part graph as
    // graph2: vertices of degree < 3 drop with their edges, 5 rounds —
    // pure integer counting per round, so the oracle unrolls the prune
    // exactly (generated CTEs). Output = surviving vertices + degree in
    // the surviving subgraph + the converged flag (min final degree >= k,
    // i.e. one more round would prune nothing — non-convergence is
    // observable, not silent).
    QueryDef("graph3_kcore",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sp = li.filter(col("l_orderkey") % 7 === 0)
          .select((col("l_suppkey") + 1000000).cast("long").as("src"),
            col("l_partkey").cast("long").as("dst"))
        val ps = li.filter(col("l_orderkey") % 7 === 1)
          .select(col("l_partkey").cast("long").as("src"),
            (col("l_suppkey") + 1000000).cast("long").as("dst"))
        graft.operators.Graph.kCore(sp.unionByName(ps), "src", "dst",
            k = 3, rounds = 5)
          .orderBy("id")
      },
      Some {
        val rounds = 5
        // AS MATERIALIZED: each round references e_i three times — DuckDB
        // inlines plain CTEs, which re-evaluates the whole chain ~3^rounds
        // times (hours at sf0.1); materialization is semantics-neutral.
        val steps = (0 until rounds).map { i =>
          s"""d$i AS MATERIALIZED (SELECT id, count(*) AS deg FROM (SELECT u AS id FROM e$i UNION ALL SELECT v FROM e$i) GROUP BY id),
             |e${i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$i e JOIN d$i da ON e.u = da.id JOIN d$i db ON e.v = db.id WHERE da.deg >= 3 AND db.deg >= 3)""".stripMargin
        }.mkString(", ")
        s"""WITH base AS (SELECT CAST(l_suppkey + 1000000 AS BIGINT) AS s, CAST(l_partkey AS BIGINT) AS d FROM lineitem WHERE l_orderkey % 7 = 0
           |UNION ALL SELECT CAST(l_partkey AS BIGINT), CAST(l_suppkey + 1000000 AS BIGINT) FROM lineitem WHERE l_orderkey % 7 = 1),
           |e0 AS MATERIALIZED (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM base WHERE s <> d),
           |$steps,
           |fin AS MATERIALIZED (SELECT id, count(*) AS deg FROM (SELECT u AS id FROM e$rounds UNION ALL SELECT v FROM e$rounds) GROUP BY id),
           |conv AS (SELECT min(deg) >= 3 AS converged FROM fin)
           |SELECT id, CAST(deg AS BIGINT) AS deg, converged FROM fin CROSS JOIN conv ORDER BY id""".stripMargin.replace("\n", " ")
      }),

    // SCD Type 2 dimension build from the event log (gaps-and-islands):
    // one row per (user, event_type run) with validity bounds — the
    // standard warehouse history dimension, via graft.operators.Scd
    // (two windows sharing one Exchange+Sort).
    QueryDef("scd1_type2",
      (s, dir) => {
        val log = t(s, dir, "events").filter(col("user_id") < 100)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("t_us"), col("event_id"))
        graft.operators.Scd.type2(log, "user_id", "event_type",
          Seq(col("t_us"), col("event_id")))
          .select(col("user_id"), col("version"), col("event_type"),
            col("valid_from").as("valid_from_us"),
            col("valid_to").as("valid_to_us"), col("is_current"))
          .orderBy("user_id", "version")
      },
      Some("""WITH log AS (SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id FROM events WHERE user_id < 100),
             |m AS (SELECT user_id, event_type, t_us, event_id,
             |CASE WHEN row_number() OVER w = 1 OR lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |FROM log WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
             |v AS (SELECT user_id, event_type, t_us,
             |sum(chg) OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version FROM m),
             |runs AS (SELECT user_id, CAST(version AS BIGINT) AS version, min(event_type) AS event_type, min(t_us) AS valid_from_us
             |FROM v GROUP BY user_id, version)
             |SELECT user_id, version, event_type, valid_from_us,
             |lead(valid_from_us) OVER wv AS valid_to_us,
             |lead(valid_from_us) OVER wv IS NULL AS is_current
             |FROM runs WINDOW wv AS (PARTITION BY user_id ORDER BY version)
             |ORDER BY user_id, version""".stripMargin.replace("\n", " ")))
  )
}
