package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's batch ingest boundary
  * (S8, scripts/batch_ingest/lambda_function.py:29-47): the Open-Meteo
  * "fetch" as `spark.read.format("graft-openmeteo")`. The network call is
  * synthesized deterministically (zero-egress container), but the
  * connector surface is the real one — TableProvider → Table →
  * ScanBuilder → Batch → PartitionReader, with one input partition per
  * city (the unit the reference fetches serially in a Lambda loop; here
  * each "fetch" is an executor task, so a thousand cities fan out across
  * the cluster) and COLUMN PRUNING pushed into the reader (a projection
  * of 2 columns builds 2-field rows — SupportsPushDownRequiredColumns).
  *
  * Value parity: rows are bit-identical to
  * `Ingest.flattenOpenMeteo(Ingest.syntheticOpenMeteo(...))` — the same
  * xxhash64-derived uniforms and HALF_UP rounding, pinned by spec — so
  * the connector and the DataFrame-synthesis path are interchangeable.
  *
  * Options: `cities` (comma-separated, required), `date` (YYYY-MM-DD),
  * `hours` (1-24), `ingestion_id`.
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
      Option(properties.get("maxTicks")).map(_.toLong).getOrElse(Long.MaxValue))
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
}

private[sources] class OpenMeteoTable(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long)
    extends Table with SupportsRead {
  require(hours >= 1 && hours <= 24, "hours must be in [1, 24]")

  override def name(): String = s"graft-openmeteo(${cities.mkString(",")})"
  override def schema(): StructType = OpenMeteoSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OpenMeteoScanBuilder(cities, date, hours, ingestionId, maxTicks)
}

private[sources] class OpenMeteoScanBuilder(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long)
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
      new OpenMeteoReaderFactory(date, hours, ingestionId, required)
    // The STREAMING face: each micro-batch is one "fetch round" (tick) —
    // the reference's EventBridge-triggered producer as a
    // MicroBatchStream. Offsets are the tick counter, so the checkpoint
    // records exactly which rounds landed: a restarted query neither
    // refetches nor skips a round (exactly-once from offset tracking,
    // spec-pinned). `maxTicks` bounds the source for Trigger.AvailableNow
    // runs and tests.
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new OpenMeteoMicroBatch(cities, date, hours, ingestionId, maxTicks, required)
  }
}

private[sources] case class TickOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

private[sources] class OpenMeteoMicroBatch(cities: Seq[String], date: String,
    hours: Int, ingestionId: String, maxTicks: Long, required: StructType)
    extends MicroBatchStream {

  override def initialOffset(): Offset = TickOffset(0L)
  override def latestOffset(): Offset = TickOffset(maxTicks)
  override def deserializeOffset(json: String): Offset = TickOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].tick
    val e = end.asInstanceOf[TickOffset].tick
    (for { t <- s until e; c <- cities } yield OpenMeteoPartition(c, t): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OpenMeteoReaderFactory(date, hours, ingestionId, required)
}

private[sources] case class OpenMeteoPartition(city: String, tick: Long)
    extends InputPartition

private[sources] class OpenMeteoReaderFactory(date: String, hours: Int,
    ingestionId: String, required: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OpenMeteoPartition]
    val city = p.city
    // tick 0 (and the batch face) uses the plain ingestion id — streaming
    // rounds after it get distinct per-round ids like the reference's
    // per-run uuid (scripts/batch_ingest/lambda_function.py:100)
    val runId = if (p.tick == 0L) ingestionId else s"$ingestionId-t${p.tick}"
    new PartitionReader[InternalRow] {
      import OpenMeteoSource.{roundN, uniform}
      private var h = -1
      private val lat = roundN(uniform(city, "lat", -60, 60), 4)
      private val lon = roundN(uniform(city, "lon", -180, 180), 4)
      // required-schema field order drives the emitted row shape — this
      // is where the pushed projection physically takes effect
      private val fieldGen: Array[Int => Any] = required.fields.map { f =>
        f.name match {
          case "ingestion_id" => (_: Int) => UTF8String.fromString(runId)
          case "city" => (_: Int) => UTF8String.fromString(city)
          case "latitude" => (_: Int) => lat
          case "longitude" => (_: Int) => lon
          case "timestamp" => (i: Int) => UTF8String.fromString(f"${date}T$i%02d:00")
          case "temperature_c" => (i: Int) => roundN(uniform(s"$city$i", "t2m", 10, 35), 1)
          case "humidity_pct" => (i: Int) => roundN(uniform(s"$city$i", "rh", 20, 95), 1)
          case "windspeed_kmh" => (i: Int) => roundN(uniform(s"$city$i", "ws", 0, 40), 1)
          case "precipitation_mm" => (i: Int) => roundN(uniform(s"$city$i", "pr", 0, 5), 1)
          case "ingested_at" => (_: Int) => UTF8String.fromString(s"${date}T06:00:00+00:00")
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }
      override def next(): Boolean = { h += 1; h < hours }
      override def get(): InternalRow =
        InternalRow.fromSeq(fieldGen.toSeq.map(_(h)))
      override def close(): Unit = ()
    }
  }
}
