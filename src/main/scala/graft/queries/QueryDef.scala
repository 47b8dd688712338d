package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark implementation over the testdata
  * tables and (when SQL-expressible) the equivalent ANSI SQL the driver
  * runs through DuckDB on the same parquet files.
  *
  * Oracle-parity rules (learned the hard way; see SURVEY.md §7.4):
  *  - identical column NAMES on both sides (driver sorts columns by name);
  *  - deterministic total ORDER BY on both sides;
  *  - no order-dependent double reductions: sum 2-decimal monetary doubles
  *    as DECIMAL(18,2) and cast the final value back to double — exact and
  *    associative in both engines;
  *  - per-row double arithmetic must be op-for-op identical (same IEEE
  *    association on both sides);
  *  - never emit the raw ns-precision `events.ts` (Spark truncates to
  *    micros, DuckDB keeps nanos) — always format/derive it.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load one testdata table (TESTDATA.md layout, ts normalized). */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, name)
}
