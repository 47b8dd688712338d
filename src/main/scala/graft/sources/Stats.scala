package graft.sources

import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer support: table and column statistics for
  * catalog-registered tables, and the session flags that let Catalyst
  * use them.
  *
  * Why this matters at 100 TB: without statistics, Spark estimates a
  * relation's size from its FILES and propagates it through operators
  * size-only (a filter is assumed to keep everything). A dimension table
  * that is small AFTER a selective filter but large on disk therefore
  * sort-merge-joins when it should broadcast. `ANALYZE TABLE … FOR
  * COLUMNS` records row counts and per-column NDV/min/max/null counts;
  * with CBO enabled, filter selectivity is estimated from them, join
  * sides get realistic sizes, broadcast decisions and multi-way join
  * ORDER follow the data instead of the file layout. The statistics
  * pass itself is one scan per table — amortized across every query
  * planned afterwards (the same trade the reference's nightly
  * `MSCK REPAIR` makes for partition discovery).
  */
object Stats {

  /** Enable cost-based optimization on this session (stats-driven
    * filter/join estimation and stats-driven join reordering). Scoped to
    * the session's SQLConf — concurrent sessions are untouched.
    */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  /** `ANALYZE TABLE` — table-level statistics (size, row count), plus
    * per-column NDV/min/max/null-count histograms for `cols`.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String] = Seq.empty): Unit = {
    spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
  }

  /** The optimizer's current row-count estimate for a table (None until
    * analyzed) — the hook tests and operators use to decide whether the
    * stats pass has run.
    */
  def rowCountEstimate(spark: SparkSession, table: String): Option[BigInt] =
    spark.table(table).queryExecution.optimizedPlan.stats.rowCount
}
