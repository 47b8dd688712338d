package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's batch ingest boundary
  * (S8, scripts/batch_ingest/lambda_function.py:29-47): the Open-Meteo
  * "fetch" as `spark.read.format("graft-openmeteo")`. The connector
  * surface is the real one — TableProvider → Table → ScanBuilder →
  * Batch → PartitionReader, with one input partition per city (the unit
  * the reference fetches serially in a Lambda loop; here each "fetch" is
  * an executor task, so a thousand cities fan out across the cluster)
  * and COLUMN PRUNING pushed into the reader (a projection of 2 columns
  * builds 2-field rows — SupportsPushDownRequiredColumns).
  *
  * The fetch itself sits behind an [[OpenMeteoFetcher]] seam selected by
  * the `fetcher` option (a class name, instantiated executor-side like
  * any connector class): the default [[SyntheticOpenMeteoFetcher]]
  * synthesizes values deterministically (zero-egress container), and
  * [[HttpOpenMeteoFetcher]] performs the reference's real HTTP GET — a
  * live endpoint is one option away, no connector change.
  *
  * Value parity: default-fetcher rows are bit-identical to
  * `Ingest.flattenOpenMeteo(Ingest.syntheticOpenMeteo(...))` — the same
  * xxhash64-derived uniforms and HALF_UP rounding, pinned by spec — so
  * the connector and the DataFrame-synthesis path are interchangeable.
  *
  * Options: `cities` (comma-separated, required), `date` (YYYY-MM-DD),
  * `hours` (1-24), `ingestion_id`, `fetcher` (class name),
  * `maxTicks` / `ticksPerBatch` (streaming; see [[OpenMeteoMicroBatch]]).
  */
class OpenMeteoSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-openmeteo"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OpenMeteoSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new OpenMeteoTable(
      Option(properties.get("cities")).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(throw new IllegalArgumentException(
          "graft-openmeteo requires a 'cities' option (comma-separated)")),
      Option(properties.get("date")).getOrElse("2026-08-12"),
      Option(properties.get("hours")).map(_.toInt).getOrElse(24),
      Option(properties.get("ingestion_id")).getOrElse("run0"),
      Option(properties.get("maxTicks")).map(_.toLong).getOrElse(Long.MaxValue),
      Option(properties.get("ticksPerBatch")).map(_.toLong).getOrElse(1L),
      Option(properties.get("fetcher"))
        .getOrElse(classOf[SyntheticOpenMeteoFetcher].getName))
}

object OpenMeteoSource {
  val schema: StructType = StructType(Seq(
    StructField("ingestion_id", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("temperature_c", DoubleType, nullable = false),
    StructField("humidity_pct", DoubleType, nullable = false),
    StructField("windspeed_kmh", DoubleType, nullable = false),
    StructField("precipitation_mm", DoubleType, nullable = false),
    StructField("ingested_at", StringType, nullable = false)))

  /** The exact arithmetic of Ingest.uniform: xxhash64(id, lit(salt)) is
    * hash(salt, hash(id, seed=42)); pmod to [0, 1e9); scale to [lo, hi).
    */
  private[sources] def uniform(id: String, salt: String, lo: Double, hi: Double): Double = {
    val h = XXH64.hashUTF8String(UTF8String.fromString(salt),
      XXH64.hashUTF8String(UTF8String.fromString(id), 42L))
    val m = ((h % 1000000000L) + 1000000000L) % 1000000000L
    lo + (m.toDouble / 1e9) * (hi - lo)
  }

  /** Spark round(col, n): BigDecimal HALF_UP. */
  private[sources] def roundN(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Deterministic city → coordinates assignment shared by the synthetic
    * fetcher and the HTTP fetcher's request URL.
    */
  private[sources] def cityCoordinates(city: String): (Double, Double) =
    (roundN(uniform(city, "lat", -60, 60), 4),
      roundN(uniform(city, "lon", -180, 180), 4))
}

/** One city's fetched forecast: coordinates plus parallel hourly arrays
  * (the exact shape of the reference's Open-Meteo response,
  * lambda_function.py:49-57).
  */
case class OpenMeteoObservation(
    latitude: Double,
    longitude: Double,
    timestamps: IndexedSeq[String],
    temperatureC: IndexedSeq[Double],
    humidityPct: IndexedSeq[Double],
    windspeedKmh: IndexedSeq[Double],
    precipitationMm: IndexedSeq[Double]) {
  require(Seq(temperatureC, humidityPct, windspeedKmh, precipitationMm)
    .forall(_.length == timestamps.length), "hourly arrays must be parallel")
}

/** The fetch boundary (the reference really calls the API —
  * lambda_function.py:37-47). Implementations need a no-arg constructor:
  * they are named by the `fetcher` option and instantiated inside the
  * partition reader on the EXECUTOR, so the fetch happens where the task
  * runs (N cities fan out as N tasks), never on the driver.
  */
trait OpenMeteoFetcher extends Serializable {
  def fetch(city: String, date: String, hours: Int): OpenMeteoObservation
}

/** Default fetcher: deterministic synthesis (zero-egress environment).
  * Bit-identical to `Ingest.syntheticOpenMeteo`'s arithmetic.
  */
class SyntheticOpenMeteoFetcher extends OpenMeteoFetcher {
  import OpenMeteoSource.{cityCoordinates, roundN, uniform}

  override def fetch(city: String, date: String, hours: Int): OpenMeteoObservation = {
    val (lat, lon) = cityCoordinates(city)
    OpenMeteoObservation(lat, lon,
      (0 until hours).map(i => f"${date}T$i%02d:00"),
      (0 until hours).map(i => roundN(uniform(s"$city$i", "t2m", 10, 35), 1)),
      (0 until hours).map(i => roundN(uniform(s"$city$i", "rh", 20, 95), 1)),
      (0 until hours).map(i => roundN(uniform(s"$city$i", "ws", 0, 40), 1)),
      (0 until hours).map(i => roundN(uniform(s"$city$i", "pr", 0, 5), 1)))
  }
}

/** The reference's REAL fetch: HTTP GET against the Open-Meteo forecast
  * API (lambda_function.py:29-47 — same query parameters, same hourly
  * fields) parsed with Jackson (already on Spark's classpath). The
  * transport is an overridable method so tests inject a canned response
  * and exercise the full parse → rows path without network.
  */
class HttpOpenMeteoFetcher extends OpenMeteoFetcher {

  /** Endpoint base. The `graft.openmeteo.baseUrl` system property
    * redirects the REAL client (same socket path, same parse) to an
    * API-compatible mirror or an in-process test server — fetchers are
    * instantiated by class name with a no-arg constructor, so a JVM-wide
    * property is the configuration seam.
    */
  protected def baseUrl: String = sys.props.getOrElse(
    "graft.openmeteo.baseUrl", "https://api.open-meteo.com/v1/forecast")

  /** GET the URL and return the response body. Override to stub transport. */
  protected def get(url: String): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val request = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(10))
      .header("User-Agent", "graft-openmeteo/1.0").GET().build()
    val response = client.send(request,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(response.statusCode() == 200,
      s"open-meteo GET failed: HTTP ${response.statusCode()} for $url")
    response.body()
  }

  override def fetch(city: String, date: String, hours: Int): OpenMeteoObservation = {
    val (lat, lon) = OpenMeteoSource.cityCoordinates(city)
    val url = baseUrl +
      s"?latitude=$lat&longitude=$lon" +
      "&hourly=temperature_2m,relative_humidity_2m,wind_speed_10m,precipitation" +
      "&forecast_days=1&timezone=UTC"
    parse(lat, lon, get(url), hours)
  }

  /** Parse the Open-Meteo JSON body into an observation, truncated to
    * `hours` entries (the API returns a full forecast day).
    */
  private[sources] def parse(lat: Double, lon: Double, body: String,
      hours: Int): OpenMeteoObservation = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hourly = mapper.readTree(body).path("hourly")
    def texts(field: String): IndexedSeq[String] = {
      val node = hourly.path(field)
      (0 until node.size).map(node.get(_).asText)
    }
    def doubles(field: String): IndexedSeq[Double] = {
      val node = hourly.path(field)
      (0 until node.size).map(node.get(_).asDouble)
    }
    val n = math.min(hours, hourly.path("time").size)
    OpenMeteoObservation(lat, lon,
      texts("time").take(n),
      doubles("temperature_2m").take(n),
      doubles("relative_humidity_2m").take(n),
      doubles("wind_speed_10m").take(n),
      doubles("precipitation").take(n))
  }
}

private[sources] class OpenMeteoTable(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long, ticksPerBatch: Long,
    fetcherClass: String)
    extends Table with SupportsRead {
  require(hours >= 1 && hours <= 24, "hours must be in [1, 24]")
  require(ticksPerBatch >= 1, "ticksPerBatch must be >= 1")

  override def name(): String = s"graft-openmeteo(${cities.mkString(",")})"
  override def schema(): StructType = OpenMeteoSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OpenMeteoScanBuilder(cities, date, hours, ingestionId, maxTicks,
      ticksPerBatch, fetcherClass)
}

private[sources] class OpenMeteoScanBuilder(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long, ticksPerBatch: Long,
    fetcherClass: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = OpenMeteoSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      cities.map(c => OpenMeteoPartition(c, 0L): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new OpenMeteoReaderFactory(date, hours, ingestionId, fetcherClass, required)
    // The STREAMING face: each micro-batch is one "fetch round" (tick) —
    // the reference's EventBridge-triggered producer as a
    // MicroBatchStream. Offsets are the tick counter, so the checkpoint
    // records exactly which rounds landed: a restarted query neither
    // refetches nor skips a round (exactly-once from offset tracking,
    // spec-pinned). `maxTicks` bounds the source for Trigger.AvailableNow
    // runs and tests.
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new OpenMeteoMicroBatch(cities, date, hours, ingestionId, maxTicks,
        ticksPerBatch, fetcherClass, required)
  }
}

private[sources] case class TickOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

/** Tick-offset micro-batch stream WITH ADMISSION CONTROL: at most
  * `ticksPerBatch` fetch rounds are admitted per micro-batch, however
  * far behind `maxTicks` the query is. Without it, latestOffset would
  * report maxTicks (default: unbounded) and the FIRST batch would plan
  * (0 until maxTicks) × cities input partitions — a Long.MaxValue range
  * materialization that dies in NumericRange before a single row moves.
  *
  * Trigger.AvailableNow is honored exactly ([[SupportsTriggerAvailableNow]]):
  * the run drains to the maxTicks captured at query start — in bounded
  * per-batch slices — and terminates. An UNBOUNDED source (maxTicks
  * unset) under AvailableNow treats the next `ticksPerBatch` rounds as
  * "what is available now" and terminates after them, rather than
  * running forever.
  */
private[sources] class OpenMeteoMicroBatch(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long, ticksPerBatch: Long,
    fetcherClass: String, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // target captured at AvailableNow query start; Long.MinValue = not an
  // AvailableNow run. Driver-side single-threaded access (the stream
  // object lives in MicroBatchExecution).
  private var availableNowTarget: Long = Long.MinValue

  override def initialOffset(): Offset = TickOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(ticksPerBatch * cities.size * hours)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = maxTicks

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TickOffset].tick
    val rowsPerTick = math.max(1L, cities.size.toLong * hours)
    val stepTicks = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows() / rowsPerTick)
      case _ => ticksPerBatch
    }
    // an unbounded AvailableNow run drains ONE admission slice, not
    // forever — capture the target ONCE at the first post-prepare call
    // (recomputing it per batch would chase the advancing start offset
    // and never terminate)
    if (availableNowTarget == Long.MaxValue)
      availableNowTarget = math.min(maxTicks, s + stepTicks)
    val target =
      if (availableNowTarget == Long.MinValue) maxTicks else availableNowTarget
    TickOffset(math.min(target, s + stepTicks))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset =
    if (maxTicks == Long.MaxValue) null else TickOffset(maxTicks)

  override def deserializeOffset(json: String): Offset = TickOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].tick
    val e = end.asInstanceOf[TickOffset].tick
    (for { t <- s until e; c <- cities } yield OpenMeteoPartition(c, t): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OpenMeteoReaderFactory(date, hours, ingestionId, fetcherClass, required)
}

private[sources] case class OpenMeteoPartition(city: String, tick: Long)
    extends InputPartition

private[sources] class OpenMeteoReaderFactory(date: String, hours: Int,
    ingestionId: String, fetcherClass: String, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OpenMeteoPartition]
    val city = p.city
    // tick 0 (and the batch face) uses the plain ingestion id — streaming
    // rounds after it get distinct per-round ids like the reference's
    // per-run uuid (scripts/batch_ingest/lambda_function.py:100)
    val runId = if (p.tick == 0L) ingestionId else s"$ingestionId-t${p.tick}"
    new PartitionReader[InternalRow] {
      private var h = -1
      // executor-side fetch, once per (city, tick) task, and ONLY if a
      // fetched column survives pruning (a projection of ingestion_id
      // and city never fetches at all)
      private lazy val obs: OpenMeteoObservation =
        Class.forName(fetcherClass).getDeclaredConstructor().newInstance()
          .asInstanceOf[OpenMeteoFetcher].fetch(city, date, hours)
      private lazy val rowCount: Int =
        if (required.fields.exists(f => f.name != "ingestion_id" && f.name != "city"
          && f.name != "ingested_at")) obs.timestamps.length
        else hours
      // required-schema field order drives the emitted row shape — this
      // is where the pushed projection physically takes effect
      private val fieldGen: Array[Int => Any] = required.fields.map { f =>
        f.name match {
          case "ingestion_id" => (_: Int) => UTF8String.fromString(runId)
          case "city" => (_: Int) => UTF8String.fromString(city)
          case "latitude" => (_: Int) => obs.latitude
          case "longitude" => (_: Int) => obs.longitude
          case "timestamp" => (i: Int) => UTF8String.fromString(obs.timestamps(i))
          case "temperature_c" => (i: Int) => obs.temperatureC(i)
          case "humidity_pct" => (i: Int) => obs.humidityPct(i)
          case "windspeed_kmh" => (i: Int) => obs.windspeedKmh(i)
          case "precipitation_mm" => (i: Int) => obs.precipitationMm(i)
          case "ingested_at" => (_: Int) => UTF8String.fromString(s"${date}T06:00:00+00:00")
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }
      override def next(): Boolean = { h += 1; h < rowCount }
      override def get(): InternalRow =
        InternalRow.fromSeq(fieldGen.toSeq.map(_(h)))
      override def close(): Unit = ()
    }
  }
}
