package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) construction from an event/CDC log.
  *
  * The reference's curated zone feeds dimensional serving tables
  * (reference README.md:125-137); building the history dimension — one row
  * per (key, attribute-run) with validity bounds — is the standard
  * warehouse move the platform's consumers would script in Athena. Here it
  * is a first-class operator: gaps-and-islands with two windows over ONE
  * shuffle (both windows share the same partitioning/ordering, so Catalyst
  * plans a single Exchange + Sort and evaluates both frames in it).
  *
  * Scale: everything is keyed by the dimension key — per-key history is
  * tiny (bounded by change count), keys parallelize arbitrarily, no
  * self-join, no driver state.
  */
object Scd {

  /** Collapse an ordered change log into Type-2 dimension rows.
    *
    * @param df       change log (one row per observation)
    * @param key      dimension key column name
    * @param attr     tracked attribute column name (a run = consecutive
    *                 observations with the same value)
    * @param orderCols total order within a key (must be deterministic —
    *                 include a tiebreaker)
    * @return one row per run: key, attr, version (1-based per key),
    *         valid_from (first order-col value of the run), valid_to
    *         (start of the next run, null for the current run), is_current
    */
  def type2(df: DataFrame, key: String, attr: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    // Null-SAFE change detection: `lag =!= attr` is NULL when either side
    // is null, which would silently fold a null-attribute observation
    // into the preceding run; <=> makes null→x and x→null real
    // transitions while null→null continues a run. The first row is its
    // own explicit condition (lag-is-null can't distinguish "no previous
    // row" from "previous attr was null"). Both window functions share
    // the one Exchange+Sort.
    val marked = df
      .withColumn("chg",
        when(row_number().over(w) === 1 ||
          !(lag(col(attr), 1).over(w) <=> col(attr)), 1).otherwise(0))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    val runs = marked
      .groupBy(col(key), col("version"))
      .agg(first(col(attr)).as(attr),
        min(orderCols.head).as("valid_from"))
    val wRun = Window.partitionBy(key).orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
