package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in `graft.queries.*`; each `QueryDef` pairs a
  * Spark query over the testdata with its DuckDB oracle SQL.
  */
object SparkEntry {

  /** All registered queries, grouped by SURVEY.md §2 family. */
  def registry: Seq[QueryDef] =
    CoreQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ IoQueries.all ++ ExtendedQueries.all ++
      TpchQueries.all ++ EvalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The documented reference flagship: group-by count over the curated
    * readings (reference README.md:130-131) — here over `events`.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
