package graft

import org.apache.spark.sql.SparkSession

/** The engine's canonical session entry point: one place that encodes the
  * configuration the operators are designed against, instead of every
  * caller rediscovering it.
  *
  * What it pins and why:
  *  - UTC session timezone — the reference's string-timestamp data model
  *    derives dates by substring; any other zone silently shifts
  *    date-partition boundaries (SURVEY.md §7.4).
  *  - parquet timestamp inference pinned to LTZ (inferTimestampNTZ off) —
  *    upstream writers (pandas/pyarrow) emit naive `timestamp[us]`; with
  *    the session zone pinned to UTC, reading those as LTZ makes
  *    `unix_micros`/window/as-of arithmetic well-typed and numerically
  *    identical to a naive reading, where NTZ inference would reject
  *    `unix_micros` outright and fork the type surface per writer.
  *  - dynamic partition overwrite — an hourly sweep must rewrite hours,
  *    not history (reference overwrites the whole curated root each run;
  *    scripts/glue_transform/transform.py:179-185).
  *  - AQE on (default in Spark 4, pinned explicitly) — runtime shuffle
  *    coalescing and skew-join splitting are part of the operators'
  *    skew story.
  *  - GraftExtensions — custom expressions as SQL functions, the jaccard
  *    prefilter and range-join optimizer rules, the skyline strategy.
  *
  * Cluster sizing is deliberately NOT hardcoded — it is data-dependent:
  *  - `spark.sql.shuffle.partitions`: ~2-3× total executor cores, raised
  *    until the largest shuffle partition fits executor memory (at
  *    100 TB inputs with 1000 executors × 8 cores, tens of thousands —
  *    or leave AQE's coalescing to trim an over-provisioned width).
  *  - `spark.sql.files.maxPartitionBytes`: 128-256 MB so scan tasks
  *    amortize scheduling but never hold more than a few row groups.
  *  Local test mains pass cores-sized values explicitly (Bench/Verify).
  */
object GraftSession {

  /** Builder preloaded with the engine's defaults; callers add master,
    * app name, and size-dependent confs, then `getOrCreate()`.
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
}
