package graft.streaming

import graft.operators.{Ingest, Transforms}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

/** Structured-Streaming slice of the reference architecture (SURVEY.md
  * §2.8): a producer fires every 5 minutes into Firehose, which buffers
  * 60 s / 5 MB and lands arrival-time-partitioned NDJSON under
  * `raw/iot-sensors/year=/month=/day=/`
  * (reference scripts/stream_generate/lambda_function.py:64-98,
  * terraform/modules/kinesis/main.tf:38-42); failed deliveries go to a
  * `firehose-errors/` prefix. The curated transform stays batch — it
  * re-sweeps the full raw prefix each run (transform.py:198-203) — so
  * exactly-once comes from overwrite idempotence, not stream state.
  *
  * Beyond strict parity, the event-time operators a lake at scale needs:
  * watermarked windowed aggregation and per-key state
  * (mapGroupsWithState), both over the same reading schema.
  */
object Streams {

  /** S11 (stream form) — rate source → synthetic sensor readings. Same
    * deterministic projection as the batch generator (Ingest), keyed by
    * the rate source's monotonically increasing `value`.
    */
  def syntheticIotStream(spark: SparkSession, cities: Seq[String],
      sensorsPerCity: Int = 3, rowsPerSecond: Int = 100): DataFrame = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    Ingest.readingProjection(
      src.select(col("value").as("id"), col("timestamp").as("event_ts")),
      cities, sensorsPerCity)
  }

  /** S10 — Firehose-analog landing sink: micro-batched NDJSON appended
    * under arrival-time partitions year=/month=/day= (zero-padded strings,
    * like the Firehose prefix `!{timestamp:yyyy/MM/dd}`), 60 s trigger by
    * default. Batches that fail to land are written to `errorPath`
    * (`firehose-errors/` analog) instead of killing the stream.
    */
  def startRawLandingSink(readings: DataFrame, path: String, checkpoint: String,
      errorPath: String, trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    readings.writeStream
      .outputMode("append")
      .queryName("raw-iot-landing")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stamped = batch
          .withColumn("year", date_format(current_timestamp(), "yyyy"))
          .withColumn("month", date_format(current_timestamp(), "MM"))
          .withColumn("day", date_format(current_timestamp(), "dd"))
        try
          stamped.write.mode("append")
            .partitionBy("year", "month", "day").json(path)
        catch {
          case e: Exception =>
            System.err.println(s"[graft] batch $batchId failed, dead-lettering: ${e.getMessage}")
            stamped.write.mode("append").json(s"$errorPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** Event-time windowed aggregation with a watermark: per-city stats over
    * tumbling windows, tolerating `lateness` of out-of-order data. The
    * reference has no watermark (late rows are folded in by the next
    * hourly overwrite sweep); this is the streaming-native equivalent.
    */
  def windowedCityStats(readings: DataFrame, window_ : String = "5 minutes",
      lateness: String = "10 minutes"): DataFrame =
    readings
      .withColumn("event_time", to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), window_), col("city"))
      .agg(
        count(lit(1)).as("readings"),
        avg(col("temperature_c")).as("avg_temp_c"),
        max(col("aqi")).as("max_aqi"))

  /** Streaming materialized view: the windowed aggregation appended to
    * parquet in `append` output mode — a window's row is written exactly
    * ONCE, after the watermark passes its end (no retractions, no
    * rewrites), so the parquet table is an ever-growing, query-ready
    * aggregate the batch serving layer reads directly. Contrast
    * `complete` mode (rewrites the whole result per trigger — O(history)
    * per batch, the same cost shape as the reference's hourly
    * full-overwrite sweep) — append keeps each trigger O(closed windows).
    */
  def startWindowedParquetSink(readings: DataFrame, path: String,
      checkpoint: String, window_ : String = "5 minutes",
      lateness: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    windowedCityStats(readings, window_, lateness)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("city"), col("readings"), col("avg_temp_c"), col("max_aqi"))
      .writeStream
      .outputMode("append")
      .queryName("windowed-mv")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)
      .start()

  /** Session windows: per-city activity sessions closed by a `gap` of
    * event-time silence — the built-in session_window aggregation
    * (dynamic-length windows, watermark-evicted state).
    */
  def sessionStats(readings: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    readings
      .withColumn("event_time", to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap), col("city"))
      .agg(count(lit(1)).as("readings"), min(col("battery_level")).as("min_battery"))

  /** Stream-stream interval join: attribute each right-stream event to
    * the left-stream events of the same key it follows within `horizon`
    * (the streaming face of operators.RangeJoin). Both sides carry
    * watermarks, so Spark bounds the join state to the horizon — an
    * un-watermarked stream-stream join buffers both streams FOREVER,
    * which is the difference between a production operator and a demo.
    * Column names are taken from the inputs: `left`(leftKey, leftTs, …),
    * `right`(rightKey, rightTs, …); key and time columns must be named
    * differently across the two sides.
    */
  def streamIntervalJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      horizon: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, horizon)
      .join(right.withWatermark(rightTs, horizon),
        expr(s"$rightKey = $leftKey AND " +
          // half-open [leftTs, leftTs + horizon) — same bound semantics as
          // the batch RangeJoin this is the streaming face of, so an event
          // exactly at the horizon boundary is attributed in neither
          s"$rightTs >= $leftTs AND $rightTs < $leftTs + INTERVAL $horizon"))

  /** LEFT OUTER stream-stream interval join: every left event is
    * emitted — joined rows as matches arrive, and the null-extended row
    * once the WATERMARK passes the join window (only then can the engine
    * prove no match will come; outer results are inherently
    * watermark-delayed). The conversion-attribution shape where
    * non-converting signups must also appear exactly once.
    */
  def streamIntervalJoinOuter(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      horizon: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, horizon)
      .join(right.withWatermark(rightTs, horizon),
        expr(s"$rightKey = $leftKey AND " +
          s"$rightTs >= $leftTs AND $rightTs < $leftTs + INTERVAL $horizon"),
        "left_outer")

  /** Incremental raw-zone sweep: the reference re-reads the ENTIRE raw
    * prefix every hour and overwrites curated
    * (reference scripts/glue_transform/transform.py:198-203,259-265) —
    * O(history) per sweep. This is the same transform as a FILE-SOURCE
    * STREAM: Spark's file source tracks processed files in the
    * checkpoint, so each trigger reads only NEW landing files —
    * O(new data) per sweep — and `maxFilesPerTrigger` bounds a batch
    * (backpressure for a backlog: a cold start over a year of landing
    * files proceeds in bounded increments instead of one giant job).
    * The derive logic is byte-identical to the batch path
    * (Transforms.deriveIot); the sink appends date-partitioned parquet.
    */
  def startIncrementalIotSweep(spark: SparkSession, rawPath: String,
      curatedPath: String, checkpoint: String, maxFilesPerTrigger: Int = 100,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val raw = spark.readStream
      .schema(graft.sources.Schemas.rawIot)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(rawPath)
    graft.operators.Transforms.deriveIot(raw)
      .writeStream
      .outputMode("append")
      .queryName("incremental-sweep")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", curatedPath)
      .partitionBy("date")
      .start()
  }

  /** Stream-static enrichment join: decorate each streaming event with
    * dimension attributes from a static (batch) table — the standard
    * "enrich the firehose with reference data" pattern. The static side
    * is explicitly `broadcast()`: every micro-batch then plans a
    * BroadcastHashJoin, the stream side is never shuffled, and NO join
    * state accumulates (unlike a stream-stream join, a stream-static
    * join is stateless — the static side is re-resolved per batch, so
    * an updated dimension table is picked up on the next trigger).
    * Left join: an event with no dimension row passes through
    * null-extended rather than silently dropping.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming CDC upsert sink: each micro-batch is MERGED into the
    * partitioned Parquet table at `path` by key — intra-batch
    * redeliveries collapse to the latest row first (max orderCol per
    * key), then `Lakehouse.mergeIntoParquet` rewrites only the
    * partitions the batch touches. The result is an always-current
    * keyed table maintained by a stream, the lakehouse CDC pattern —
    * where the reference's Firehose sink only ever appends raw events
    * (kinesis/main.tf:31-41) and leaves compaction to the batch layer.
    *
    * At scale the cost per trigger is O(batch + touched partitions),
    * not O(table). Exactly-once: the merge is idempotent for a replayed
    * batch (same keys ⇒ same rewrite), which is the foreachBatch
    * contract's requirement on retries.
    */
  def startCdcUpsertSink(changes: DataFrame, path: String, checkpoint: String,
      keys: Seq[String], partitionCol: String, orderCol: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .queryName("cdc-upsert")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = batch.join(
          batch.groupBy(keys.map(col): _*).agg(max(col(orderCol)).as(orderCol)),
          keys :+ orderCol, "left_semi")
          // a key redelivered with the SAME orderCol twice survives the
          // semi-join twice; arbitrary-but-deterministic final tiebreak
          .dropDuplicates(keys)
        val spark = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(path)
        val exists =
          target.getFileSystem(spark.sessionState.newHadoopConf()).exists(target)
        if (!exists) {
          graft.sources.IO.writeCuratedParquet(latest, path, Seq(partitionCol))
        } else {
          graft.sources.Lakehouse.mergeIntoParquet(spark, path, latest, keys, partitionCol)
          ()
        }
      }
      .start()

  /** Streaming exact dedup: drop redeliveries of the same key arriving
    * within the watermark horizon — the step that turns the Firehose-style
    * at-least-once landing into exactly-once curated rows.
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`, which
    * retains every key seen FOREVER) evicts key state once the watermark
    * passes it, so state is bounded by arrival rate × lateness, not by
    * stream history — the only form that survives an unbounded stream.
    */
  def dedupStream(readings: DataFrame, keyCols: Seq[String],
      eventTimeCol: String, lateness: String = "10 minutes"): DataFrame =
    readings
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Reading(sensor_id: String, city: String, timestamp: String,
      temperature_c: Double, humidity_pct: Double, aqi: Double, battery_level: Double)

  final case class SensorHealth(sensor_id: String, readings: Long,
      last_battery: Double, min_battery: Double, low_battery: Boolean)

  final case class BatteryAlert(sensor_id: String, battery_level: Double,
      previous_level: Double)

  /** flatMapGroupsWithState: emit 0..n alert rows per group per batch —
    * one alert each time a sensor's battery falls below `threshold` from
    * at-or-above it (edge-triggered, so a flat low battery doesn't spam).
    * State per sensor is just the last seen level.
    */
  def batteryAlerts(readings: Dataset[Reading], threshold: Double = 20.0)
      : Dataset[BatteryAlert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[Double, BatteryAlert](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (sensorId: String, rows: Iterator[Reading], state: GroupState[Double]) =>
          var last = state.getOption.getOrElse(Double.MaxValue)
          val alerts = rows.toSeq.sortBy(_.timestamp).flatMap { r =>
            val fired =
              if (last >= threshold && r.battery_level < threshold)
                Some(BatteryAlert(sensorId, r.battery_level, last))
              else None
            last = r.battery_level
            fired
          }
          state.update(last)
          alerts.iterator
      }
  }

  /** Custom per-key state via mapGroupsWithState: rolling battery health
    * per sensor — the KeyValueGroupedDataset stateful surface
    * (SURVEY.md §2.9 UDAF/state row). State lives in the state store,
    * scales with distinct sensors, not readings.
    */
  def sensorHealth(readings: Dataset[Reading]): Dataset[SensorHealth] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.sensor_id)
      .mapGroupsWithState[SensorHealth, SensorHealth](GroupStateTimeout.NoTimeout) {
        (sensorId: String, rows: Iterator[Reading], state: GroupState[SensorHealth]) =>
          val prev = state.getOption.getOrElse(
            SensorHealth(sensorId, 0L, 100.0, Double.MaxValue, low_battery = false))
          val updated = rows.foldLeft(prev) { (acc, r) =>
            SensorHealth(sensorId, acc.readings + 1, r.battery_level,
              math.min(acc.min_battery, r.battery_level),
              r.battery_level < 20.0)
          }
          state.update(updated)
          updated
      }
  }

  /** [[sensorHealth]] on `transformWithState` (Spark 4's arbitrary-state
    * API, which requires the RocksDB state store —
    * [[StateBackend.useRocksDb]]) with an optional per-key state TTL.
    *
    * The TTL is the at-scale difference from mapGroupsWithState: over an
    * unbounded key domain (sensors churn, doc/session ids never repeat)
    * untimed per-key state grows monotonically for the stream's
    * lifetime, and mapGroupsWithState only bounds it via hand-rolled
    * timeout plumbing in every operator. A `TTLConfig` evicts any key
    * not written within the duration inside the store itself — state is
    * then bounded by active keys × TTL, whatever the stream's history.
    * Semantics for live keys are IDENTICAL to [[sensorHealth]]
    * (StateBackendSpec pins it); an evicted key simply restarts its
    * rolling counters on next sight.
    */
  def sensorHealthTws(readings: Dataset[Reading],
      stateTtl: Option[java.time.Duration] = None): Dataset[SensorHealth] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.sensor_id)
      .transformWithState(new SensorHealthProcessor(stateTtl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  private class SensorHealthProcessor(stateTtl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Reading, SensorHealth] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SensorHealth] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SensorHealth]("health",
        org.apache.spark.sql.Encoders.product[SensorHealth],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, rows: Iterator[Reading],
        timers: TimerValues): Iterator[SensorHealth] = {
      val prev =
        if (state.exists()) state.get()
        else SensorHealth(key, 0L, 100.0, Double.MaxValue, low_battery = false)
      val updated = rows.foldLeft(prev) { (acc, r) =>
        SensorHealth(key, acc.readings + 1, r.battery_level,
          math.min(acc.min_battery, r.battery_level),
          r.battery_level < 20.0)
      }
      state.update(updated)
      Iterator.single(updated)
    }
  }
}
