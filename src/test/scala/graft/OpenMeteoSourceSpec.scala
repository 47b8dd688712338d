package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._

/** The DataSourceV2 connector for the batch-ingest boundary: value
  * parity with the DataFrame-synthesis path, per-city partitioning,
  * and column pruning pushed into the reader.
  */
class OpenMeteoSourceSpec extends SparkSpec {

  import spark.implicits._

  private val cities = Seq("Paris", "Tokyo", "New York")

  private def viaSource = spark.read.format("graft-openmeteo")
    .option("cities", cities.mkString(","))
    .option("date", "2026-08-12").option("hours", 24)
    .load()

  test("connector rows are bit-identical to the synthesized flatten path") {
    val fromSource = viaSource.orderBy("city", "timestamp").collect().toSeq
    val fromFrames = Ingest.flattenOpenMeteo(
      Ingest.syntheticOpenMeteo(spark, cities, "2026-08-12", 24))
      .orderBy("city", "timestamp").collect().toSeq
    assert(fromSource.size == cities.size * 24)
    assert(fromSource == fromFrames)
  }

  test("one input partition per city; column pruning reaches the reader") {
    assert(viaSource.rdd.getNumPartitions == cities.size)
    val pruned = viaSource.select("city", "temperature_c")
    // v2 scans print their (pruned) output attribute list, not ReadSchema
    val scan = pruned.queryExecution.executedPlan.toString
    assert("BatchScan [^\\[]*\\[city#\\d+, temperature_c#\\d+\\]".r.findFirstIn(scan).isDefined,
      s"projection not pushed into the scan:\n$scan")
    assert(pruned.count() == cities.size * 24)
  }

  test("micro-batch face: tick offsets give exactly-once rounds across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "om_stream").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-openmeteo")
        .option("cities", cities.mkString(","))
        .option("hours", 4).option("maxTicks", 3)
        .load()
        .writeStream.format("parquet").option("path", s"$root/out")
        .outputMode("append").option("checkpointLocation", s"$root/chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    run()
    val rows = spark.read.parquet(s"$root/out")
    assert(rows.count() == 3 * cities.size * 4) // 3 ticks x 3 cities x 4 hours
    // distinct per-round ingestion ids
    assert(rows.select("ingestion_id").distinct().count() == 3)
    // a restart with the same checkpoint has nothing left to fetch:
    // the committed offset already equals maxTicks (exactly-once)
    run()
    assert(spark.read.parquet(s"$root/out").count() == 3 * cities.size * 4)
  }

  test("missing cities option fails with a comprehensible error") {
    val e = intercept[Exception] {
      spark.read.format("graft-openmeteo").load().collect()
    }
    assert(e.getMessage != null)
  }

  test("fetcher seam: a canned-transport HTTP fetcher flows through the DataSourceV2 path") {
    val df = spark.read.format("graft-openmeteo")
      .option("cities", "Paris").option("date", "2026-08-12").option("hours", 2)
      .option("fetcher", classOf[CannedOpenMeteoFetcher].getName)
      .load()
    val rows = df.orderBy("timestamp").collect()
    assert(rows.length == 2, "two hourly entries in the canned body")
    // the rows are exactly what the fetcher returned — full parse → rows
    // path, zero network
    val direct = new CannedOpenMeteoFetcher().fetch("Paris", "2026-08-12", 2)
    assert(rows.map(_.getAs[String]("timestamp")).toSeq == direct.timestamps)
    assert(rows.map(_.getAs[Double]("temperature_c")).toSeq == direct.temperatureC)
    assert(rows.map(_.getAs[Double]("humidity_pct")).toSeq == direct.humidityPct)
    assert(rows.map(_.getAs[Double]("windspeed_kmh")).toSeq == direct.windspeedKmh)
    assert(rows.map(_.getAs[Double]("precipitation_mm")).toSeq == direct.precipitationMm)
    assert(rows.forall(_.getAs[Double]("latitude") == direct.latitude))
    // `hours` truncates a longer forecast-day response
    val one = spark.read.format("graft-openmeteo")
      .option("cities", "Paris").option("hours", 1)
      .option("fetcher", classOf[CannedOpenMeteoFetcher].getName)
      .load()
    assert(one.count() == 1)
  }

  test("streaming without maxTicks is admission-bounded, not a Long.MaxValue batch") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "om_unbounded").toString
    // no maxTicks option: the unfixed source planned (0 until
    // Long.MaxValue) x cities partitions here and died before row one
    val q = spark.readStream.format("graft-openmeteo")
      .option("cities", cities.mkString(","))
      .option("hours", 2)
      .load()
      .writeStream.format("parquet").option("path", s"$root/out")
      .outputMode("append").option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // AvailableNow on an unbounded source drains exactly one admission
    // slice (ticksPerBatch defaults to 1) and terminates
    assert(spark.read.parquet(s"$root/out").count() == cities.size * 2)
  }

  test("ticksPerBatch slices a bounded drain into multiple micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "om_sliced").toString
    val q = spark.readStream.format("graft-openmeteo")
      .option("cities", cities.mkString(","))
      .option("hours", 2).option("maxTicks", 4).option("ticksPerBatch", 2)
      .load()
      .writeStream.format("parquet").option("path", s"$root/out")
      .outputMode("append").option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/out").count() == 4 * cities.size * 2)
    // 4 ticks / 2 per batch = 2 commits in the offset log
    val commits = new java.io.File(s"$root/chk/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(commits == 2, s"expected 2 micro-batches, saw $commits commits")
  }

  test("real socket: the unmodified HTTP fetcher drives a live in-process server") {
    // Stand up a real HTTP server on an ephemeral port and point the REAL
    // client at it via the baseUrl property — the full GET (HttpClient,
    // headers, status handling) and parse run over an actual socket,
    // matching the reference's live fetch end to end; only the hostname
    // differs from production.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val body =
      """{"latitude": 48.85, "longitude": 2.35, "hourly": {
        |"time": ["2026-08-12T00:00", "2026-08-12T01:00", "2026-08-12T02:00"],
        |"temperature_2m": [11.5, 12.5, 13.0],
        |"relative_humidity_2m": [50.0, 51.0, 52.5],
        |"wind_speed_10m": [5.0, 6.5, 7.0],
        |"precipitation": [0.0, 0.1, 0.2]}}""".stripMargin
    val failAll = new java.util.concurrent.atomic.AtomicBoolean(false)
    server.createContext("/v1/forecast", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        seen.add(q)
        val (code, payload) = if (failAll.get) (500, "boom") else (200, body)
        val bytes = payload.getBytes("UTF-8")
        x.sendResponseHeaders(code, bytes.length)
        x.getResponseBody.write(bytes); x.close()
      }
    })
    server.start()
    val port = server.getAddress.getPort
    System.setProperty("graft.openmeteo.baseUrl", s"http://127.0.0.1:$port/v1/forecast")
    try {
      val rows = spark.read.format("graft-openmeteo")
        .option("cities", "Paris").option("date", "2026-08-12").option("hours", 2)
        .option("fetcher", classOf[graft.sources.HttpOpenMeteoFetcher].getName)
        .load().orderBy("timestamp").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Double]("temperature_c")).toSeq == Seq(11.5, 12.5))
      assert(rows.map(_.getAs[Double]("precipitation_mm")).toSeq == Seq(0.0, 0.1))
      // the request carried the reference's exact query surface
      // (lambda_function.py:29-36): coordinates + the four hourly fields
      val q = seen.poll()
      assert(q != null && q.contains("latitude=") && q.contains("longitude="))
      assert(q.contains("hourly=temperature_2m,relative_humidity_2m,wind_speed_10m,precipitation"))
      assert(q.contains("forecast_days=1") && q.contains("timezone=UTC"))
      // non-200 surfaces as a comprehensible failure, like the
      // reference's raise_for_status
      failAll.set(true)
      val err = intercept[Exception] {
        spark.read.format("graft-openmeteo")
          .option("cities", "ErrCity").option("hours", 2)
          .option("fetcher", classOf[graft.sources.HttpOpenMeteoFetcher].getName)
          .load().collect()
      }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))).mkString(" | ")
      assert(rootMsg(err).contains("HTTP 500"), s"got: ${rootMsg(err)}")
    } finally {
      System.clearProperty("graft.openmeteo.baseUrl")
      server.stop(0)
    }
  }
}

/** Test fetcher: the real [[graft.sources.HttpOpenMeteoFetcher]] parse
  * path with the transport stubbed to a canned Open-Meteo response body
  * (3 hourly entries — callers asking fewer get a truncated observation).
  */
class CannedOpenMeteoFetcher extends graft.sources.HttpOpenMeteoFetcher {
  override protected def get(url: String): String =
    """{"latitude": 48.85, "longitude": 2.35, "hourly": {
      |"time": ["2026-08-12T00:00", "2026-08-12T01:00", "2026-08-12T02:00"],
      |"temperature_2m": [11.5, 12.5, 13.0],
      |"relative_humidity_2m": [50.0, 51.0, 52.5],
      |"wind_speed_10m": [5.0, 6.5, 7.0],
      |"precipitation": [0.0, 0.1, 0.2]}}""".stripMargin
}
