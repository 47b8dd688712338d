package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest analogs of the reference's two producers (SURVEY.md §2.1 S8-S11,
  * §2.4 G1): the Open-Meteo zip-flatten and the synthetic IoT generator.
  */
object Ingest {

  /** G1 — parallel-array zip-flatten. The Open-Meteo `hourly` block is five
    * index-aligned parallel arrays; the reference loops in Python emitting
    * one record per hour, null-filling short value arrays
    * (scripts/batch_ingest/lambda_function.py:50-73). The canonical Spark
    * form is `explode(arrays_zip(...))`: `arrays_zip` pads the shorter
    * arrays with null, matching the reference's `.get(i)` semantics, and
    * the per-run constants (ingestion_id, city, lat/lon, ingested_at) ride
    * along as ordinary columns — fully parallel, no generator UDTF needed.
    *
    * Input: openMeteoResponse shape (Schemas.openMeteoResponse) plus
    * `ingestion_id`, `city`, `ingested_at` constant columns.
    * Output: rawWeather rows (FIXTURES.md A1).
    */
  def flattenOpenMeteo(resp: DataFrame): DataFrame =
    resp
      .withColumn("h", explode(arrays_zip(
        col("hourly.time").as("time"),
        col("hourly.temperature_2m").as("temperature_2m"),
        col("hourly.relative_humidity_2m").as("relative_humidity_2m"),
        col("hourly.wind_speed_10m").as("wind_speed_10m"),
        col("hourly.precipitation").as("precipitation"))))
      .filter(col("h.time").isNotNull) // reference iterates over `time` only
      .select(
        col("ingestion_id"),
        col("city"),
        col("latitude"),
        col("longitude"),
        col("h.time").as("timestamp"),
        col("h.temperature_2m").as("temperature_c"),
        col("h.relative_humidity_2m").as("humidity_pct"),
        col("h.wind_speed_10m").as("windspeed_kmh"),
        col("h.precipitation").as("precipitation_mm"),
        col("ingested_at"))

  /** Deterministic uniform double in [lo, hi) derived from hashing the id
    * with a salt. Unlike `rand(seed)` (partitioning-dependent), this is
    * reproducible no matter how the rows are partitioned — the property the
    * reference gets from seeding per-sensor ids
    * (scripts/stream_generate/lambda_function.py:7-9,33-36).
    */
  private def uniform(id: Column, salt: String, lo: Double, hi: Double): Column = {
    val u = (pmod(xxhash64(id, lit(salt)), lit(1000000000L)).cast("double") / 1e9)
    lit(lo) + u * lit(hi - lo)
  }

  /** Shared reading projection for both generator forms (batch
    * `spark.range` and streaming rate source): expects `id` (long) and
    * `event_ts` (timestamp) columns; derives sensor identity and readings
    * shaped like scripts/stream_generate/lambda_function.py:39-61 —
    * per-city temperature base, uniform humidity/battery, 70/20/10 AQI
    * mixture, and the reference's deterministic sensor ids (F2).
    */
  def readingProjection(base: DataFrame, cities: Seq[String],
      sensorsPerCity: Int): DataFrame = {
    val perTick = cities.size.toLong * sensorsPerCity
    val cityArr = array(cities.map(lit): _*)
    val slotted = base
      .withColumn("slot", pmod(col("id"), lit(perTick)))
      .withColumn("city", element_at(cityArr, (col("slot") / sensorsPerCity).cast("int") + 1))
      .withColumn("sensor_index", pmod(col("slot"), lit(sensorsPerCity.toLong)).cast("int"))

    val cityBase = lit(15.0) + uniform(col("city"), "citybase", 0, 30) // base in [15,45)
    val aqiU = uniform(col("id"), "aqisel", 0, 1)

    slotted.select(
      Transforms.sensorId(col("city"), col("sensor_index")).as("sensor_id"),
      col("city"),
      date_format(col("event_ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("timestamp"),
      round(cityBase + uniform(col("id"), "tjit", -9, 9), 1).as("temperature_c"),
      round(uniform(col("id"), "hum", 20, 95), 1).as("humidity_pct"),
      round(
        when(aqiU < 0.7, uniform(col("id"), "aqi1", 0, 50))
          .when(aqiU < 0.9, uniform(col("id"), "aqi2", 51, 100))
          .otherwise(uniform(col("id"), "aqi3", 101, 200)), 1).as("aqi"),
      round(uniform(col("id"), "batt", 15, 100), 1).as("battery_level"))
  }

  /** S11 — synthetic IoT batch: `ticks` readings for `sensorsPerCity`
    * sensors in each city. Generated distributively from `spark.range` —
    * no driver-side loop, so it scales to any row count.
    */
  def syntheticIotBatch(spark: SparkSession, cities: Seq[String],
      sensorsPerCity: Int = 3, ticks: Int = 1,
      startEpochSec: Long = 1754982000L, tickSeconds: Int = 300): DataFrame = {
    val perTick = cities.size.toLong * sensorsPerCity
    val base = spark.range(perTick * ticks)
      .withColumn("event_ts",
        timestamp_seconds(lit(startEpochSec) + (col("id") / perTick).cast("long") * tickSeconds))
    readingProjection(base, cities, sensorsPerCity)
  }

  /** Open-Meteo-shaped synthetic response rows (one per city) for
    * exercising G1 without the network (the reference's HTTP fetch,
    * scripts/batch_ingest/lambda_function.py:29-47, is a driver-side
    * boundary we replace with deterministic synthesis).
    */
  def syntheticOpenMeteo(spark: SparkSession, cities: Seq[String],
      date: String = "2026-08-12", hours: Int = 24): DataFrame = {
    val cityArr = array(cities.map(lit): _*)
    val hourIdx = sequence(lit(0), lit(hours - 1))
    spark.range(cities.size)
      .withColumn("city", element_at(cityArr, col("id").cast("int") + 1))
      .select(
        lit("run0").as("ingestion_id"),
        col("city"),
        round(uniform(col("city"), "lat", -60, 60), 4).as("latitude"),
        round(uniform(col("city"), "lon", -180, 180), 4).as("longitude"),
        struct(
          transform(hourIdx, h => format_string(s"${date}T%02d:00", h)).as("time"),
          transform(hourIdx, h =>
            round(uniform(concat(col("city"), h), "t2m", 10, 35), 1)).as("temperature_2m"),
          transform(hourIdx, h =>
            round(uniform(concat(col("city"), h), "rh", 20, 95), 1)).as("relative_humidity_2m"),
          transform(hourIdx, h =>
            round(uniform(concat(col("city"), h), "ws", 0, 40), 1)).as("wind_speed_10m"),
          transform(hourIdx, h =>
            round(uniform(concat(col("city"), h), "pr", 0, 5), 1)).as("precipitation")
        ).as("hourly"),
        lit(s"${date}T06:00:00+00:00").as("ingested_at"))
  }
}
