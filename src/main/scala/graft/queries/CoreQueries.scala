package graft.queries

import graft.operators.{Transforms, Validation}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-operator parity queries (SURVEY.md §2) expressed over the
  * driver testdata so the DuckDB oracle can verify them. Each name maps to
  * a SURVEY §2 inventory row.
  */
object CoreQueries {

  import QueryDef.t

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** ISO-8601 string form of a timestamp column — the string-timestamp
    * data model of the reference (SURVEY.md §1.2). Second precision: the
    * testdata `events.ts` carries nanoseconds which Spark and DuckDB
    * truncate differently, so derived strings stop at seconds.
    */
  private def isoTs(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss")

  val all: Seq[QueryDef] = Seq(

    // A2 — the documented flagship: group-by count (reference README.md:130-131).
    QueryDef("a2_groupby_count",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type"),
      Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type")),

    // A3 — filtered count over a date predicate (docs/runbook.md:161 shape).
    QueryDef("a3_filtered_count",
      (s, dir) => t(s, dir, "events")
        .filter(isoTs(col("ts")).startsWith("2024-01-0"))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM events WHERE strftime(ts, '%Y-%m-%dT%H:%M:%S') LIKE '2024-01-0%'")),

    // A1/V1-V3 — the validator's fused single-pass aggregate (SURVEY.md §2.6):
    // total rows + null counts + out-of-range counts in ONE scan.
    QueryDef("a1_validation_fused",
      (s, dir) => Validation.validationSummary(t(s, dir, "events"),
        Seq(Validation.NotNull("event_type"), Validation.Between("value", 0.0, 50.0))),
      Some("""SELECT count(*) AS total_count,
             |CAST(coalesce(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_count_event_type,
             |CAST(coalesce(sum(CASE WHEN value < 0.0 OR value > 50.0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS oor_count_value
             |FROM events""".stripMargin.replace("\n", " "))),

    // Extended expectation suite: uniqueness (exact distinct vs non-null,
    // still ONE scan — count(DISTINCT) expands into the same aggregate)
    // and set membership (nulls pass, like `between`'s 3-valued logic).
    QueryDef("a11_validation_extended",
      (s, dir) => Validation.validationSummary(t(s, dir, "events"),
        Seq(Validation.Unique("event_id"), Validation.Unique("user_id"),
          Validation.InSet("event_type", Seq("view", "click", "purchase")))),
      Some("""SELECT count(*) AS total_count,
             |CAST(count(DISTINCT event_id) AS BIGINT) AS distinct_count_event_id,
             |CAST(coalesce(sum(CASE WHEN event_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS non_null_count_event_id,
             |CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_count_user_id,
             |CAST(coalesce(sum(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS non_null_count_user_id,
             |CAST(coalesce(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('view','click','purchase') THEN 1 ELSE 0 END), 0) AS BIGINT) AS unexpected_count_event_type
             |FROM events""".stripMargin.replace("\n", " "))),

    // Exact anomaly flags: |x − μ| > 3σ per event_type, decided entirely
    // in integer arithmetic on fixed-point sums — (n·x − S)² > 9(n·SS − S²)
    // — so borderline flags never flip with partitioning or engine (a
    // float μ/σ pipeline cannot promise that). One agg + one co-keyed
    // join; the oracle reproduces the identical integer test.
    QueryDef("an1_anomaly_flags",
      (s, dir) => graft.operators.Anomaly.zscoreFlags(
        t(s, dir, "events").select("event_id", "event_type", "value"),
        "event_type", "value", z = 3, scale = 100)
        .filter(col("is_anomaly"))
        .select("event_id", "event_type", "v_scaled")
        .orderBy("event_id"),
      Some("""WITH sc AS (SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events),
             |st AS (SELECT event_type, count(v) AS n, sum(v) AS s, sum(v * v) AS ss FROM sc GROUP BY 1)
             |SELECT event_id, sc.event_type, v AS v_scaled
             |FROM sc JOIN st ON sc.event_type IS NOT DISTINCT FROM st.event_type
             |WHERE n >= 2 AND n * ss - s * s > 0
             |  AND (n * v - s) * (n * v - s) > 9 * (n * ss - s * s)
             |ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Robust outlier summary: median/MAD per group, exact-integer cutoff
    // (an1's fixed-point discipline applied to the heavy-tail-safe
    // statistic). Two partial-aggregated passes + broadcast joins; the
    // oracle replays the identical integer test on DuckDB's
    // quantile_cont (bit-parity with Spark percentile proven by a6).
    QueryDef("an2_mad_outliers",
      (s, dir) => graft.operators.Anomaly.madOutliers(
        t(s, dir, "events").select("event_type", "value"),
        "event_type", "value", z = 3, scale = 100)
        .select("event_type", "n", "med2", "mad4", "n_outliers")
        .orderBy("event_type"),
      Some("""WITH sc AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xs FROM events WHERE value IS NOT NULL),
             |m AS (SELECT event_type, quantile_cont(xs, 0.5) AS med FROM sc GROUP BY 1),
             |d AS (SELECT sc.event_type, xs, med, CAST(round(abs(xs - med) * 2) AS BIGINT) AS a2 FROM sc JOIN m USING (event_type)),
             |md AS (SELECT event_type, CAST(round(quantile_cont(a2, 0.5) * 2) AS BIGINT) AS mad4 FROM d GROUP BY 1)
             |SELECT d.event_type, count(xs) AS n,
             |CAST(round(max(med) * 2) AS BIGINT) AS med2, max(md.mad4) AS mad4,
             |CAST(sum(CASE WHEN 20000 * a2 > 3 * 14826 * md.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin.replace("\n", " "))),

    // Robust per-group feature scaling: (x − med)/IQR — heavy-tail-safe
    // standardization. One percentile agg broadcast back + a map-only
    // row pass; both engines' interpolation and per-row IEEE ops are
    // bit-identical (a6), rounded to 6.
    QueryDef("rscale1_robust_scale",
      (s, dir) => graft.operators.Anomaly.robustScale(
        t(s, dir, "events").select("event_id", "event_type", "value"),
        "event_type", "value")
        .select("event_id", "event_type", "scaled")
        .orderBy("event_id"),
      Some("""WITH st AS (SELECT event_type AS k, quantile_cont(value, 0.5) AS med,
             |quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
             |FROM events WHERE value IS NOT NULL GROUP BY 1)
             |SELECT e.event_id, e.event_type,
             |CASE WHEN iqr = 0 THEN NULL ELSE round((e.value - med) / iqr, 6) END AS scaled
             |FROM events e JOIN st ON e.event_type = st.k
             |WHERE e.value IS NOT NULL ORDER BY e.event_id""".stripMargin.replace("\n", " "))),

    // Seasonal robust outlier profile: an2's median/MAD machinery keyed
    // on (event_type × hour-of-day) — "is this value anomalous FOR THIS
    // TIME of day" (a nightly-low sensor reading is normal at 03:00 and
    // an alarm at 15:00; a global cutoff can't see that). Zero new
    // operator code: the composite key IS the seasonality model.
    QueryDef("an3_seasonal_mad",
      (s, dir) => graft.operators.Anomaly.madOutliers(
        t(s, dir, "events")
          .filter(col("event_type").isNotNull)
          .withColumn("season",
            concat(col("event_type"), lit(":"),
              lpad(hour(col("ts")).cast("string"), 2, "0")))
          .select("season", "value"),
        "season", "value", z = 3, scale = 100)
        .select("season", "n", "med2", "mad4", "n_outliers")
        .orderBy("season"),
      Some("""WITH sc AS (SELECT event_type || ':' || lpad(CAST(date_part('hour', ts) AS VARCHAR), 2, '0') AS season,
             |CAST(round(value * 100) AS BIGINT) AS xs FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |m AS (SELECT season, quantile_cont(xs, 0.5) AS med FROM sc GROUP BY 1),
             |d AS (SELECT sc.season, xs, med, CAST(round(abs(xs - med) * 2) AS BIGINT) AS a2 FROM sc JOIN m USING (season)),
             |md AS (SELECT season, CAST(round(quantile_cont(a2, 0.5) * 2) AS BIGINT) AS mad4 FROM d GROUP BY 1)
             |SELECT d.season, count(xs) AS n,
             |CAST(round(max(med) * 2) AS BIGINT) AS med2, max(md.mad4) AS mad4,
             |CAST(sum(CASE WHEN 20000 * a2 > 3 * 14826 * md.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (season)
             |GROUP BY d.season ORDER BY d.season""".stripMargin.replace("\n", " "))),

    // Table profile: per-column count/null/distinct/min/max in ONE scan
    // (every column's stats ride the same aggregate) — the trust-a-new-
    // feed report, reshaped to a row per column. The oracle unions
    // per-column SELECTs over the same relation.
    QueryDef("prof1_table_profile",
      (s, dir) => graft.operators.Profile.profile(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value"))
        .orderBy("col_name"),
      Some("""SELECT * FROM (
             |SELECT 'event_id' AS col_name, count(*) AS n, CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct, CAST(min(event_id) AS DOUBLE) AS min_val, CAST(max(event_id) AS DOUBLE) AS max_val FROM events
             |UNION ALL SELECT 'user_id', count(*), CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT), CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE) FROM events
             |UNION ALL SELECT 'event_type', count(*), CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT event_type) AS BIGINT), NULL, NULL FROM events
             |UNION ALL SELECT 'value', count(*), CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT value) AS BIGINT), CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE) FROM events)
             |ORDER BY col_name""".stripMargin.replace("\n", " "))),

    // Profile drift: the first week of events vs the full table — the
    // data-observability delta report (row growth, null deltas,
    // cardinality growth per column). The oracle recomputes both
    // profiles and differences them.
    // Exact two-sample KS statistic (binless drift test, vs drift2's
    // binned PSI): sample = every 3rd event vs the full table, so the
    // true D is small and any computation error shows. Fixed-point
    // integers end to end; the cumulative CDFs come from the
    // range-segmented prefix-sum, never a single global window task.
    QueryDef("drift3_ks",
      (s, dir) => {
        val ev = t(s, dir, "events")
        graft.operators.Profile.ksStatistic(
          ev.filter(col("event_id") % 3 === 0), ev, "value", scale = 100)
      },
      Some("""WITH av AS (SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events WHERE value IS NOT NULL AND event_id % 3 = 0),
             |bv AS (SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events WHERE value IS NOT NULL),
             |ca AS (SELECT v, count(*) AS c FROM av GROUP BY v),
             |cb AS (SELECT v, count(*) AS c FROM bv GROUP BY v),
             |m AS (SELECT coalesce(ca.v, cb.v) AS v, coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb FROM ca FULL JOIN cb ON ca.v = cb.v),
             |n AS (SELECT (SELECT count(*) FROM av) AS na, (SELECT count(*) FROM bv) AS nb),
             |c AS (SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cA,
             |sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cB FROM m)
             |SELECT na AS n_a, nb AS n_b,
             |CAST(max(abs(cA * nb - cB * na)) * 1000000 // (na * nb) AS BIGINT) AS ks_x1e6
             |FROM c, n GROUP BY na, nb""".stripMargin.replace("\n", " "))),

    QueryDef("drift1_profile_drift",
      (s, dir) => {
        val events = t(s, dir, "events").select("event_id", "user_id", "value")
        graft.operators.Profile.drift(
          events.filter(col("event_id") % 3 === 0), events)
          .orderBy("col_name")
      },
      Some("""WITH b AS (
             |  SELECT 'event_id' AS col_name, count(*) AS n, CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl, CAST(count(DISTINCT event_id) AS BIGINT) AS nd FROM events WHERE event_id % 3 = 0
             |  UNION ALL SELECT 'user_id', count(*), CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT) FROM events WHERE event_id % 3 = 0
             |  UNION ALL SELECT 'value', count(*), CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT value) AS BIGINT) FROM events WHERE event_id % 3 = 0),
             |a AS (
             |  SELECT 'event_id' AS col_name, count(*) AS n, CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl, CAST(count(DISTINCT event_id) AS BIGINT) AS nd FROM events
             |  UNION ALL SELECT 'user_id', count(*), CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT) FROM events
             |  UNION ALL SELECT 'value', count(*), CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(count(DISTINCT value) AS BIGINT) FROM events)
             |SELECT col_name, a.n - b.n AS n_delta, a.nl - b.nl AS nulls_delta, a.nd - b.nd AS distinct_delta
             |FROM b JOIN a USING (col_name) ORDER BY col_name""".stripMargin.replace("\n", " ")))

    ,
    // Conditional-function surface: coalesce / nullif / greatest / least
    // over derived nullable columns — the CASE-adjacent family the Athena
    // contract implies.
    QueryDef("f14_conditional_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 25 === 0)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floored_price"),
          least(col("o_custkey"), col("o_orderkey")).as("smaller_key"),
          nullif(col("o_orderpriority"), col("o_orderpriority")).isNull.as("self_nullif_is_null"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
             |greatest(o_totalprice, 100000.0) AS floored_price,
             |least(o_custkey, o_orderkey) AS smaller_key,
             |nullif(o_orderpriority, o_orderpriority) IS NULL AS self_nullif_is_null
             |FROM orders WHERE o_orderkey % 25 = 0 ORDER BY o_orderkey""".stripMargin.replace("\n", " "))),

    // P2 — range (theta) predicate filter (transform.py:80-83 shape).
    QueryDef("p2_range_filter",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity") < 5 || col("l_quantity") > 45)
        // int32 passthrough upcast to long: the board's output contract
        // is the closed 64-bit type set (OracleLintSpec)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"))
        // (orderkey, linenumber) is NOT unique in the testdata — the
        // quantity tiebreak makes the ordering total on both engines
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45 ORDER BY l_orderkey, l_linenumber, l_quantity")),

    // P5 — derived unit conversion, op-for-op the reference formula
    // round(x * 9/5 + 32, 2) (transform.py:171-173).
    QueryDef("p5_derived_unit",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          round(col("value") * lit(9.0) / lit(5.0) + lit(32.0), 2).as("value_f"))
        .orderBy("event_id"),
      Some("SELECT event_id, round((value * 9.0) / 5.0 + 32.0, 2) AS value_f FROM events ORDER BY event_id")),

    // P6 — event-date via substring on the ISO string, NOT to_date
    // (transform.py:174-177 semantics).
    QueryDef("p6_date_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          Transforms.eventDate(isoTs(col("ts"))).as("event_date"))
        .orderBy("event_id"),
      Some("SELECT event_id, substring(strftime(ts, '%Y-%m-%dT%H:%M:%S'), 1, 10) AS event_date FROM events ORDER BY event_id")),

    // P7 — three-arm CASE quality score (transform.py:239-251), with
    // events.value standing in for battery_level (FIXTURES.md §B role map).
    QueryDef("p7_case_quality",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          Transforms.qualityScore(col("value"), col("value"),
            col("event_type"), col("user_id")).as("quality_score"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CASE
             |WHEN value >= 50 AND value IS NOT NULL AND event_type IS NOT NULL AND user_id IS NOT NULL THEN 'PASS'
             |WHEN value >= 20 THEN 'WARN' ELSE 'FAIL' END AS quality_score
             |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // F1/P4 — sha2 pseudonymization + PII column drop (transform.py:122-130,232-235).
    QueryDef("f1_pseudonymize",
      (s, dir) => t(s, dir, "customer")
        .withColumn("c_name_hash", Transforms.pseudonymize(col("c_name")))
        .drop("c_name")
        .select("c_custkey", "c_name_hash")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, sha256(c_name) AS c_name_hash FROM customer ORDER BY c_custkey")),

    // F2 — deterministic sensor-id derivation (stream_generate/lambda_function.py:33-36).
    QueryDef("f2_sensor_id",
      (s, dir) => t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          Transforms.sensorId(col("n_name"), col("n_nationkey")).as("sensor_id"))
        .orderBy("n_nationkey"),
      Some("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, 'sensor-' || substring(sha256(printf('%s_%03d', lower(replace(n_name, ' ', '_')), n_nationkey)), 1, 12) AS sensor_id FROM nation ORDER BY n_nationkey")),

    // F3 — string normalization for storage keys (batch_ingest/lambda_function.py:82).
    QueryDef("f3_normalize",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), Transforms.normalizeCity(col("p_name")).as("p_key"))
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, lower(replace(p_name, ' ', '_')) AS p_key FROM part ORDER BY p_partkey")),

    // F5 — ingestion-time stamping (batch_ingest/lambda_function.py:71):
    // the live operator stamps current_timestamp(), which no oracle can
    // restate, so the board entry FREEZES the clock through the
    // operator's own clock parameter — the formatter, the UTC session
    // zone, and the plumbing are all value-checked; only the clock
    // source is substituted. The same formatter also runs over each
    // row's own event ts so the per-row ISO-8601 path (not just a
    // constant) is exercised.
    QueryDef("f5_timestamp_stamping",
      (s, dir) => Transforms.stampIngestedAt(
          t(s, dir, "events").select(col("event_id"), col("ts")),
          clock = to_timestamp(lit("2026-08-15 12:00:00")))
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("event_iso"),
          col("ingested_at"))
        .orderBy("event_id"),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS event_iso,
             |'2026-08-15T12:00:00Z' AS ingested_at
             |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // F6 — JSON field extraction (the from_json/to_json surface; events.props
    // is a JSON string per FIXTURES.md §B).
    QueryDef("f6_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, props->>'k' AS k FROM events ORDER BY event_id")),

    // F-family breadth: the string-function surface the open SQL contract
    // implies (SURVEY.md §2.3 "date / math / array functions beyond the
    // above — all native") — one query exercising the common set with
    // byte-identical cross-engine output.
    QueryDef("f10_string_funcs",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          split(col("c_name"), "#").getItem(1).as("name_num"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS uname,
             |lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             |split_part(c_name, '#', 2) AS name_num,
             |reverse(c_mktsegment) AS seg_rev,
             |translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
             |CAST(length(c_name) AS BIGINT) AS name_len,
             |concat_ws('|', c_mktsegment, c_name) AS joined
             |FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin.replace("\n", " "))),

    // Date/time-function breadth: truncation, month-end, day arithmetic,
    // ISO week, day name — emitted as strings/ints both engines agree on.
    QueryDef("f11_date_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          date_format(col("o_orderdate"), "EEEE").as("dow_name"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
             |CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
             |CAST(extract('week' FROM o_orderdate) AS BIGINT) AS iso_week,
             |dayname(o_orderdate) AS dow_name
             |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin.replace("\n", " "))),

    // Q1-shaped pricing summary: the canonical partial+final hash aggregate.
    // Monetary sums go through DECIMAL(18,2) so the reduction is exact and
    // order-independent, then back to double for the compare.
    QueryDef("q1_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "))),

    // Array-function surface (the Athena/Presto list-manipulation family):
    // per-user sorted distinct event types, then size/membership/index/
    // slice/join/set-ops over the array. Order-sensitive ops are pinned
    // to sorted-distinct inputs (and re-sorted after union) so both
    // engines agree element-for-element; intersect is expressed as an
    // order-preserving filter on both sides for the same reason.
    // Every array-typed result is projected through array_join so the
    // output schema is all-scalar (the comparison harness sorts columns
    // with pandas, which cannot order ndarray cells).
    QueryDef("f12_array_funcs",
      (s, dir) => {
        val keep = array(lit("view"), lit("click"))
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(array_sort(collect_set(col("event_type"))).as("types"))
          .select(col("user_id"),
            array_join(col("types"), ",").as("types_str"),
            size(col("types")).cast("long").as("n_types"),
            array_contains(col("types"), "view").as("has_view"),
            element_at(col("types"), 1).as("first_type"),
            array_join(slice(col("types"), 1, 2), ",").as("first2"),
            array_join(col("types"), ",").as("joined"),
            array_join(filter(col("types"), t => array_contains(keep, t)), ",").as("kept"),
            array_join(filter(col("types"), _ =!= "view"), ",").as("no_view"),
            array_join(array_sort(array_union(col("types"), array(lit("zzz")))), ",").as("with_zzz"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, array_to_string(types, ',') AS types_str,
             |CAST(len(types) AS BIGINT) AS n_types,
             |list_contains(types, 'view') AS has_view,
             |types[1] AS first_type,
             |array_to_string(types[1:2], ',') AS first2,
             |array_to_string(types, ',') AS joined,
             |array_to_string(list_filter(types, t -> list_contains(['view','click'], t)), ',') AS kept,
             |array_to_string(list_filter(types, t -> t <> 'view'), ',') AS no_view,
             |array_to_string(list_sort(list_distinct(list_concat(types, ['zzz']))), ',') AS with_zzz
             |FROM (SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
             |      FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Map-function surface: per-user event_type→count maps built with
    // map_from_entries over sorted entries, then consumed via
    // size/element_at/map_values-aggregate/map_keys — the MapType family.
    // The oracle reproduces the VALUES through plain SQL aggregates (maps
    // exist engine-side; what must match is what they compute).
    QueryDef("f13_map_funcs",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          coalesce(element_at(col("m"), "view"), lit(0L)).as("view_cnt"),
          aggregate(map_values(col("m")), lit(0L), _ + _).as("total"),
          array_join(map_keys(col("m")), ",").as("types_joined"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt,
             |count(*) AS total,
             |string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_joined
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),

    // Column-level encryption round-trip (f14): the engine analog of the
    // reference's at-rest encryption (KMS/SSE in its terraform) — PII
    // columns encrypted with codegen'd aes_encrypt (GCM for sealed
    // fields, deterministic ECB where joinability on the ciphertext is
    // required), then decrypted back. Ciphertexts are key/IV-internal,
    // but the INVARIANTS are SQL: every row round-trips, and the
    // deterministic mode yields identical ciphertext across independent
    // encryptions (count == n_rows each).
    QueryDef("f15_crypto_roundtrip",
      (s, dir) => {
        import graft.operators.Crypto
        val key = "0123456789abcdef" // 16-byte demo key; the KMS seam injects real ones
        val src = t(s, dir, "customer").select(
          col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_name").as("orig_name"), col("c_mktsegment").as("orig_seg"))
        val enc = Crypto.encryptColumns(
          Crypto.encryptColumns(src, Seq("c_name"), key),
          Seq("c_mktsegment"), key, deterministic = true)
          .withColumn("seg_ct", col("c_mktsegment"))
        val dec = Crypto.decryptColumns(
          Crypto.decryptColumns(enc, Seq("c_name"), key),
          Seq("c_mktsegment"), key, deterministic = true)
        val again = Crypto.encryptColumns(
          t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          Seq("c_mktsegment"), key, deterministic = true)
          .select(col("c_custkey"), col("c_mktsegment").as("seg_enc2"))
        dec.join(again, "c_custkey")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("c_name") === col("orig_name"), 1L).otherwise(0L)).as("n_name_roundtrip"),
            sum(when(col("c_mktsegment") === col("orig_seg"), 1L).otherwise(0L)).as("n_seg_roundtrip"),
            sum(when(col("seg_ct") === col("seg_enc2"), 1L).otherwise(0L)).as("n_det_stable"))
      },
      Some("""SELECT count(*) AS n_rows, count(*) AS n_name_roundtrip,
             |count(*) AS n_seg_roundtrip, count(*) AS n_det_stable
             |FROM customer""".stripMargin.replace("\n", " "))),

    // KMV theta-sketch set cardinalities — oracle-checked via ERROR
    // BOUNDS: the estimates are hash-order-internal, but "within the
    // sketch's relative error of the exact set sizes" is SQL. The exact
    // distinct/intersection/union counts come from one per-user
    // aggregate (both engines), the booleans ride the margins: ~4/√k
    // for the direct estimates; the intersection inherits the union's
    // error scaled by 1/Jaccard, so its margin is wider.
    QueryDef("a10_kmv_overlap",
      (s, dir) => {
        import graft.functions.KmvFunctions._
        val k = 256
        val est = t(s, dir, "events")
          .agg(
            kmv_sketch(when(col("event_type") === "view", col("user_id")), k).as("sv"),
            kmv_sketch(when(col("event_type") === "click", col("user_id")), k).as("sc"))
          .select(
            kmv_distinct(col("sv"), k).as("est_viewers"),
            kmv_distinct(col("sc"), k).as("est_clickers"),
            kmv_intersect(col("sv"), col("sc"), k).as("est_overlap"),
            kmv_union_distinct(col("sv"), col("sc"), k).as("est_either"))
        val exact = t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
            max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"))
          .agg(
            sum(col("v")).as("exact_viewers"),
            sum(col("c")).as("exact_clickers"),
            sum(col("v") * col("c")).as("exact_overlap"),
            sum(greatest(col("v"), col("c"))).as("exact_either"))
        def ok(estC: Column, exactC: Column, tol: Double): Column =
          abs(estC / exactC.cast("double") - 1.0) <= tol
        est.crossJoin(exact).select(
          col("exact_viewers"), col("exact_clickers"),
          col("exact_overlap"), col("exact_either"),
          ok(col("est_viewers"), col("exact_viewers"), 0.25).as("viewers_ok"),
          ok(col("est_clickers"), col("exact_clickers"), 0.25).as("clickers_ok"),
          ok(col("est_overlap"), col("exact_overlap"), 0.5).as("overlap_ok"),
          ok(col("est_either"), col("exact_either"), 0.25).as("either_ok"))
      },
      Some("""WITH pu AS (SELECT user_id,
             |max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             |max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
             |FROM events GROUP BY user_id)
             |SELECT CAST(sum(v) AS BIGINT) AS exact_viewers,
             |CAST(sum(c) AS BIGINT) AS exact_clickers,
             |CAST(sum(v * c) AS BIGINT) AS exact_overlap,
             |CAST(sum(greatest(v, c)) AS BIGINT) AS exact_either,
             |TRUE AS viewers_ok, TRUE AS clickers_ok, TRUE AS overlap_ok, TRUE AS either_ok
             |FROM pu""".stripMargin.replace("\n", " ")))
  )
}
