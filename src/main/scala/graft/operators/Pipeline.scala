package graft.operators

import graft.sources.{IO, Schemas}
import org.apache.spark.sql.SparkSession
import graft.operators.Validation.ValidationReport

/** End-to-end transform lifecycle mirroring the reference's Glue job
  * (reference scripts/glue_transform/transform.py:134-270 and SURVEY.md
  * §3.3): read raw NDJSON → empty-guard → validate (observe, never gate,
  * transform.py:165-167) → derive → date-partitioned snappy Parquet →
  * catalog register + partition repair.
  */
object Pipeline {

  final case class TransformOutcome(
      dataset: String, rowsWritten: Long, skippedEmpty: Boolean,
      validation: Option[ValidationReport])

  /** transform_weather (transform.py:134-190). */
  def transformWeather(spark: SparkSession, rawPath: String, curatedPath: String,
      registerAs: Option[String] = None): TransformOutcome = {
    val raw = IO.readNdjson(spark, Schemas.rawWeather, rawPath)
    if (raw.isEmpty) // S3 empty-input short-circuit (transform.py:145-147)
      return TransformOutcome("raw_weather", 0L, skippedEmpty = true, None)
    val report = Validation.validate(raw, "raw_weather", Validation.weatherSuite)
    if (!report.success)
      System.err.println(s"[graft] validation failed (proceeding): $report")
    val curated = Transforms.deriveWeather(raw)
    IO.writeCuratedParquet(curated, curatedPath)
    registerAs.foreach { t =>
      IO.createExternalTable(spark, t, "PARQUET",
        curated.schema, Seq("date"), curatedPath)
    }
    TransformOutcome("raw_weather", curated.count(), skippedEmpty = false, Some(report))
  }

  /** Partition-scoped backfill: re-derive ONLY the given event dates and
    * overwrite just those curated partitions (dynamic partition
    * overwrite leaves every other partition's files byte-untouched).
    * The reference rewrites the WHOLE curated root every run
    * (transform.py:179-185) — O(history) per sweep; backfill is
    * O(affected dates). The raw side is re-read in full here because
    * the raw zone is arrival-partitioned, not event-partitioned
    * (SURVEY.md §2.8's two-clock model); at scale, bound the raw scan
    * with an arrival-window predicate covering the backfill dates plus
    * the pipeline's max lateness.
    */
  def backfillIot(spark: SparkSession, rawPath: String, curatedPath: String,
      dates: Seq[String]): TransformOutcome = {
    require(dates.nonEmpty, "backfill needs at least one date")
    val raw = IO.readNdjson(spark, Schemas.rawIot, rawPath)
    if (raw.isEmpty)
      return TransformOutcome("raw_iot_sensors", 0L, skippedEmpty = true, None)
    val report = Validation.validate(raw, "raw_iot_sensors", Validation.iotSuite)
    if (!report.success)
      System.err.println(s"[graft] validation failed (proceeding): $report")
    val slice = Transforms.deriveIot(raw)
      .filter(org.apache.spark.sql.functions.col("date").isin(dates: _*))
    IO.writeCuratedParquet(slice, curatedPath)
    TransformOutcome("raw_iot_sensors", slice.count(), skippedEmpty = false, Some(report))
  }

  /** transform_iot_sensors (transform.py:193-270). */
  def transformIot(spark: SparkSession, rawPath: String, curatedPath: String,
      registerAs: Option[String] = None): TransformOutcome = {
    val raw = IO.readNdjson(spark, Schemas.rawIot, rawPath)
    if (raw.isEmpty)
      return TransformOutcome("raw_iot_sensors", 0L, skippedEmpty = true, None)
    val report = Validation.validate(raw, "raw_iot_sensors", Validation.iotSuite)
    if (!report.success)
      System.err.println(s"[graft] validation failed (proceeding): $report")
    val curated = Transforms.deriveIot(raw)
    IO.writeCuratedParquet(curated, curatedPath)
    registerAs.foreach { t =>
      IO.createExternalTable(spark, t, "PARQUET",
        curated.schema, Seq("date"), curatedPath)
    }
    TransformOutcome("raw_iot_sensors", curated.count(), skippedEmpty = false, Some(report))
  }
}
