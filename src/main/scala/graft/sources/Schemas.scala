package graft.sources

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's four tables plus the transient
  * Open-Meteo response shape.
  *
  * The reference infers JSON schema per run (reference
  * scripts/glue_transform/transform.py:144,203) while simultaneously
  * declaring fixed catalog DDL (terraform/modules/glue/main.tf:53-98 etc.).
  * We treat the declared DDL as authoritative and read with explicit
  * schemas for determinism (SURVEY.md §1.3).
  */
object Schemas {

  /** raw_weather — terraform/modules/glue/main.tf:53-98; produced by
    * scripts/batch_ingest/lambda_function.py:61-72. Partition col `date`
    * (string) is discovered from the path.
    */
  val rawWeather: StructType = StructType(Seq(
    StructField("ingestion_id", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timestamp", StringType),
    StructField("temperature_c", DoubleType),
    StructField("humidity_pct", DoubleType),
    StructField("windspeed_kmh", DoubleType),
    StructField("precipitation_mm", DoubleType),
    StructField("ingested_at", StringType)))

  /** raw_iot_sensors — terraform/modules/glue/main.tf:119-161; produced by
    * scripts/stream_generate/lambda_function.py:39-61. Partition cols
    * year/month/day (strings) discovered from the path.
    */
  val rawIot: StructType = StructType(Seq(
    StructField("sensor_id", StringType),
    StructField("city", StringType),
    StructField("timestamp", StringType),
    StructField("temperature_c", DoubleType),
    StructField("humidity_pct", DoubleType),
    StructField("aqi", DoubleType),
    StructField("battery_level", DoubleType)))

  /** curated_weather — terraform/modules/glue/main.tf:181-231 =
    * rawWeather + temperature_f; partitioned by event-date `date`.
    */
  val curatedWeather: StructType =
    StructType(rawWeather.fields :+ StructField("temperature_f", DoubleType))

  /** curated_sensor_readings — terraform/modules/glue/main.tf:251-289 =
    * rawIot minus sensor_id, plus sensor_id_hash + quality_score.
    */
  val curatedSensorReadings: StructType = StructType(Seq(
    StructField("sensor_id_hash", StringType),
    StructField("city", StringType),
    StructField("timestamp", StringType),
    StructField("temperature_c", DoubleType),
    StructField("humidity_pct", DoubleType),
    StructField("aqi", DoubleType),
    StructField("battery_level", DoubleType),
    StructField("quality_score", StringType)))

  /** Transient Open-Meteo forecast response — parallel arrays under
    * `hourly`, index-aligned (scripts/batch_ingest/lambda_function.py:50-57).
    */
  val openMeteoResponse: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(DoubleType)),
      StructField("wind_speed_10m", ArrayType(DoubleType)),
      StructField("precipitation", ArrayType(DoubleType)))))))

  /** Driver testdata table names (TESTDATA.md). */
  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}
