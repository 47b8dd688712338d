package graft

import graft.operators.{Ingest, Transforms}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Parity tests against reference-derived vectors (SURVEY.md §7.4:
  * hash parity, numeric parity, string-date semantics).
  */
class TransformsSpec extends SparkSpec {

  import spark.implicits._

  test("sha2 matches Python hashlib.sha256 hexdigest (FIXTURES.md A5 vector)") {
    val out = Seq("sensor-x").toDF("s")
      .select(Transforms.pseudonymize(col("s"))).as[String].head()
    assert(out == "f117a34923d1c90a5f29b889f9f3e23f4d6de10410e22b520a30095890c26135")
  }

  test("pseudonymize is null-safe like the reference UDF (transform.py:124-126)") {
    val out = Seq[Option[String]](None).toDF("s")
      .select(Transforms.pseudonymize(col("s"))).head()
    assert(out.isNullAt(0))
  }

  test("sensor id derivation matches stream_generate/lambda_function.py:33-36") {
    val out = Seq(("New York", 0), ("Tokyo", 2)).toDF("city", "i")
      .select(Transforms.sensorId(col("city"), col("i"))).as[String].collect()
    assert(out.sameElements(Array("sensor-0e4a3d76a2ef", "sensor-e56259fd8125")))
  }

  test("fahrenheit uses double 9/5 (Python semantics, not integer division)") {
    val out = Seq(23.5, 0.0, -40.0).toDF("c")
      .select(Transforms.fahrenheit(col("c"))).as[Double].collect()
    assert(out.sameElements(Array(74.3, 32.0, -40.0)))
  }

  test("event date is substring(ts,1,10), preserving string semantics") {
    val out = Seq("2026-08-12T07:00").toDF("ts")
      .select(Transforms.eventDate(col("ts"))).as[String].head()
    assert(out == "2026-08-12")
  }

  test("stampIngestedAt LIVE clock: default current_timestamp matches the frozen-clock format") {
    // the oracle board's f5 entry freezes the clock to value-check the
    // formatter; this is the LIVE face (batch_ingest/lambda_function.py:71
    // stamps datetime.now): under the UTC session the DEFAULT clock must
    // render the same ISO-8601 second-precision shape with the Z offset,
    // pin ONE value per query (Spark fixes current_timestamp at plan
    // time — the reference's one stamp per Lambda invocation), and
    // parse back to a timestamp inside the test's own wall-clock window.
    val before = java.time.Instant.now().minusSeconds(2)
    val out = Transforms.stampIngestedAt(
        spark.range(500).toDF("id").repartition(7))
      .select("ingested_at").as[String].collect()
    val after = java.time.Instant.now().plusSeconds(2)
    assert(out.length == 500)
    assert(out.distinct.length == 1,
      s"one stamp per query expected, got ${out.distinct.length}")
    val stamp = out.head
    assert(stamp.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""),
      s"live stamp must render the frozen-clock ISO shape: $stamp")
    val parsed = java.time.Instant.parse(stamp)
    assert(!parsed.isBefore(before) && !parsed.isAfter(after),
      s"live stamp $stamp outside the test window [$before, $after]")
  }

  test("quality score trichotomy (transform.py:239-251)") {
    val rows = Seq(
      (60.0, Some(1.0), Some(1.0), Some(1.0), "PASS"),  // battery>=50, all present
      (60.0, None, Some(1.0), Some(1.0), "WARN"),       // battery>=50 but temp null
      (30.0, Some(1.0), Some(1.0), Some(1.0), "WARN"),  // 20<=battery<50
      (10.0, Some(1.0), Some(1.0), Some(1.0), "FAIL"),  // battery<20
      (50.0, Some(1.0), Some(1.0), Some(1.0), "PASS"),  // boundary 50 inclusive
      (20.0, None, None, None, "WARN"))                 // boundary 20 inclusive
      .toDF("battery", "temp", "hum", "aqi", "expected")
    val got = rows.withColumn("got",
      Transforms.qualityScore(col("battery"), col("temp"), col("hum"), col("aqi")))
    assert(got.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("zip-flatten pads short value arrays with null (lambda_function.py:60-73)") {
    val schema = StructType(Seq(
      StructField("ingestion_id", StringType), StructField("city", StringType),
      StructField("latitude", DoubleType), StructField("longitude", DoubleType),
      StructField("ingested_at", StringType),
      StructField("hourly", graft.sources.Schemas.openMeteoResponse("hourly").dataType)))
    val row = Row("run1", "X", 1.0, 2.0, "2026-08-12T06:00:00+00:00",
      Row(Seq("2026-08-12T00:00", "2026-08-12T01:00"),
        Seq(20.0), Seq(50.0, 51.0), Seq(5.0, 6.0), Seq(0.0, 0.1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema)
    val out = Ingest.flattenOpenMeteo(df).orderBy("timestamp").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("temperature_c") == 20.0)
    assert(out(1).isNullAt(out(1).fieldIndex("temperature_c"))) // null-filled tail
    assert(out(1).getAs[Double]("humidity_pct") == 51.0)
    assert(out.forall(_.getAs[String]("city") == "X"))
  }

  test("zip-flatten of empty hourly produces zero records") {
    val schema = StructType(Seq(
      StructField("ingestion_id", StringType), StructField("city", StringType),
      StructField("latitude", DoubleType), StructField("longitude", DoubleType),
      StructField("ingested_at", StringType),
      StructField("hourly", graft.sources.Schemas.openMeteoResponse("hourly").dataType)))
    val row = Row("run1", "X", 1.0, 2.0, "t",
      Row(Seq.empty[String], Seq.empty[Double], Seq.empty[Double],
        Seq.empty[Double], Seq.empty[Double]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(row)), schema)
    assert(Ingest.flattenOpenMeteo(df).count() == 0)
  }

  test("synthetic IoT generator is deterministic and in-distribution") {
    val a = Ingest.syntheticIotBatch(spark, Seq("A City", "B"), 2, 3).collect()
    val b = Ingest.syntheticIotBatch(spark, Seq("A City", "B"), 2, 3).collect()
    assert(a.sameElements(b))
    assert(a.length == 2 * 2 * 3)
    assert(a.forall { r =>
      val h = r.getAs[Double]("humidity_pct"); h >= 20 && h <= 95 })
    assert(a.forall(_.getAs[String]("sensor_id").startsWith("sensor-")))
  }
}
