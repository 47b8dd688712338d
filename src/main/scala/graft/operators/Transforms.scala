package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's derive/pseudonymize operator family
  * (reference scripts/glue_transform/transform.py:134-270), re-expressed as
  * codegen'd built-in expressions — no UDFs, no Python boundary.
  */
object Transforms {

  /** P5 — `round(temperature_c * 9/5 + 32, 2)` (transform.py:171-173).
    * Double arithmetic (Python `9/5` = 1.8), HALF_UP round to 2 places.
    */
  def fahrenheit(c: Column): Column = round(c * lit(9.0) / lit(5.0) + lit(32.0), 2)

  /** P6 — event date via `substring(timestamp, 1, 10)` on the ISO-8601
    * STRING (transform.py:174-177,254-257). Deliberately not `to_date`:
    * string semantics are byte-identical to the reference.
    */
  def eventDate(ts: Column): Column = substring(ts, 1, 10)

  /** F1 — SHA-256 pseudonymization. The reference registers a Python UDF
    * (transform.py:122-130) forcing a JVM<->Python serialization boundary
    * per row; `sha2(_, 256)` is the codegen'd built-in producing the
    * identical lowercase-hex digest, null-safe.
    */
  def pseudonymize(c: Column): Column = sha2(c, 256)

  /** F2 — deterministic sensor id:
    * `sensor-` + first 12 hex of sha256("<city_lower_underscored>_<%03d>")
    * (scripts/stream_generate/lambda_function.py:33-36).
    */
  def sensorId(city: Column, index: Column): Column =
    concat(lit("sensor-"),
      substring(sha2(format_string("%s_%03d", normalizeCity(city), index), 256), 1, 12))

  /** F3 — `city.replace(" ", "_").lower()`
    * (scripts/batch_ingest/lambda_function.py:82).
    */
  def normalizeCity(city: Column): Column = lower(regexp_replace(city, " ", "_"))

  /** F5 — ingestion-time stamping: `datetime.now(UTC).isoformat()` →
    * `ingested_at` (reference scripts/batch_ingest/lambda_function.py:71,
    * stream_generate/lambda_function.py:56), as the ISO-8601 second-
    * precision string under `spark.sql.session.timeZone=UTC` (zero
    * offset renders as `Z`, matching Python's `+00:00`-normalized form
    * the reference sinks re-parse).
    *
    * `clock` defaults to the live `current_timestamp()` — one value per
    * query (Spark pins it at plan time), exactly the reference's one
    * stamp per Lambda invocation. Pass a LITERAL clock to make the
    * output deterministic: the oracle board's f5 entry freezes it so
    * the formatter/UTC plumbing is value-checked, and a replayed
    * pipeline stamps the ORIGINAL batch's clock, not replay time.
    */
  def stampIngestedAt(df: DataFrame,
      clock: Column = current_timestamp()): DataFrame =
    df.withColumn("ingested_at",
      date_format(clock, "yyyy-MM-dd'T'HH:mm:ssXXX"))

  /** P7 — three-arm quality score (transform.py:239-251):
    * PASS if battery>=50 and temp/humidity/aqi all non-null;
    * WARN if battery>=20; else FAIL.
    */
  def qualityScore(battery: Column, temp: Column, humidity: Column, aqi: Column): Column =
    when(battery >= 50 && temp.isNotNull && humidity.isNotNull && aqi.isNotNull, lit("PASS"))
      .when(battery >= 20, lit("WARN"))
      .otherwise(lit("FAIL"))

  /** Weather derivation (transform.py:171-177): + temperature_f, + date. */
  def deriveWeather(raw: DataFrame): DataFrame =
    raw.withColumn("temperature_f", fahrenheit(col("temperature_c")))
      .withColumn("date", eventDate(col("timestamp")))

  /** IoT derivation (transform.py:232-257): pseudonymize + drop PII column
    * (P4), quality score, event date.
    */
  def deriveIot(raw: DataFrame): DataFrame =
    raw.withColumn("sensor_id_hash", pseudonymize(col("sensor_id")))
      .drop("sensor_id")
      .withColumn("quality_score",
        qualityScore(col("battery_level"), col("temperature_c"),
          col("humidity_pct"), col("aqi")))
      .withColumn("date", eventDate(col("timestamp")))
      .select("sensor_id_hash", "city", "timestamp", "temperature_c",
        "humidity_pct", "aqi", "battery_level", "quality_score", "date")
}
