package graft

import graft.streaming.Streams
import graft.streaming.Streams.Reading
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming slice: landing sink layout, watermarked windowed aggregation,
  * and mapGroupsWithState sensor health — driven through MemoryStream.
  */
class StreamsSpec extends SparkSpec {

  import spark.implicits._

  private def reading(id: String, ts: String, battery: Double, temp: Double = 25.0) =
    Reading(id, "Tokyo", ts, temp, 50.0, 40.0, battery)

  test("raw landing sink writes arrival-partitioned NDJSON (Firehose layout)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "streamspec").toString
    mem.addData(
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0),
      reading("s2", "2026-08-12T06:00:10+00:00", 15.0))
    val q = Streams.startRawLandingSink(mem.toDF(), s"$root/raw",
      s"$root/chk", s"$root/errors", Trigger.AvailableNow())
    q.awaitTermination(60000)

    val back = spark.read
      .schema(graft.sources.Schemas.rawIot.add("year", "string")
        .add("month", "string").add("day", "string"))
      .json(s"$root/raw")
    assert(back.count() == 2)
    // arrival-time partition columns are zero-padded strings
    val parts = back.select("year", "month", "day").distinct().collect().head
    assert(parts.getString(0).length == 4 && parts.getString(1).length == 2
      && parts.getString(2).length == 2)
    // the landing zone feeds the SAME batch transform as the reference
    val outcome = graft.operators.Pipeline.transformIot(spark, s"$root/raw", s"$root/curated")
    assert(outcome.rowsWritten == 2)
  }

  test("CDC upsert sink keeps the latest row per key across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Double)] // key, part, seq, v
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cdcspec").toString
    val df = mem.toDF().toDF("id", "part", "seq", "v")
    def run(): Unit = {
      val q = Streams.startCdcUpsertSink(df, s"$root/table", s"$root/chk",
        Seq("id"), "part", "seq", Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    // batch 1: two keys, one intra-batch redelivery (seq 2 wins for id 1)
    mem.addData((1L, "p0", 1L, 10.0), (1L, "p0", 2L, 11.0), (2L, "p1", 1L, 20.0))
    run()
    val t1 = spark.read.parquet(s"$root/table")
      .select("id", "seq", "v").as[(Long, Long, Double)].collect().toSet
    assert(t1 == Set((1L, 2L, 11.0), (2L, 1L, 20.0)))
    // batch 2: update id 2, insert id 3; id 1's partition untouched
    mem.addData((2L, "p1", 5L, 21.0), (3L, "p0", 1L, 30.0))
    run()
    val t2 = spark.read.parquet(s"$root/table")
      .select("id", "seq", "v").as[(Long, Long, Double)].collect().toSet
    assert(t2 == Set((1L, 2L, 11.0), (2L, 5L, 21.0), (3L, 1L, 30.0)))
  }

  test("windowed aggregation with watermark groups by event time") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      reading("s1", "2026-08-12T06:01:00+00:00", 80.0, temp = 20.0),
      reading("s2", "2026-08-12T06:02:00+00:00", 60.0, temp = 30.0),
      reading("s1", "2026-08-12T06:07:00+00:00", 79.0, temp = 40.0))
    val q = Streams.windowedCityStats(mem.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("win_stats")
      .select(col("window.start").cast("string").as("start"),
        col("readings"), col("avg_temp_c"))
      .orderBy("start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 25.0)
    assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 40.0)
  }

  test("mergeable sketches run inside watermarked streaming windows") {
    // The TypedImperativeAggregate family (here Misra-Gries heavy
    // hitters) composes with Structured Streaming's stateful windowed
    // aggregation: partial sketch states merge across micro-batches —
    // the per-window top-k at 100 TB/day without exact per-key state.
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      reading("s1", "2026-08-12T06:01:00+00:00", 80.0),
      reading("s1", "2026-08-12T06:02:00+00:00", 79.0),
      reading("s1", "2026-08-12T06:03:00+00:00", 78.0),
      reading("s2", "2026-08-12T06:04:00+00:00", 60.0),
      reading("s3", "2026-08-12T06:31:00+00:00", 50.0))
    val q = mem.toDF()
      .select(col("sensor_id"), to_timestamp(col("timestamp")).as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(graft.functions.HeavyHittersFunctions
        .heavy_hitters(col("sensor_id"), 4).as("top"))
      .writeStream.format("memory").queryName("stream_hh")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("stream_hh")
      .select(col("window.start").cast("string").as("start"), col("top"))
      .orderBy("start").collect()
    assert(rows.length == 2)
    val w1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(w1 == Map("s1" -> 3L, "s2" -> 1L)) // k >= distinct → exact counts
    val w2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(w2 == Map("s3" -> 1L))
  }

  test("mapGroupsWithState tracks per-sensor battery health across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.sensorHealth(mem.toDS())
      .writeStream.format("memory").queryName("health")
      .outputMode("update").trigger(Trigger.ProcessingTime("1 second")).start()
    mem.addData(reading("s1", "t1", 50.0), reading("s1", "t2", 30.0))
    q.processAllAvailable()
    mem.addData(reading("s1", "t3", 10.0)) // second batch: state carries over
    q.processAllAvailable()
    q.stop()
    val last = spark.table("health").filter(col("sensor_id") === "s1")
      .orderBy(col("readings").desc).collect().head
    assert(last.getAs[Long]("readings") == 3)       // state survived the batch boundary
    assert(last.getAs[Double]("min_battery") == 10.0)
    assert(last.getAs[Boolean]("low_battery"))
  }

  test("session windows close after the event-time gap") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0),
      reading("s1", "2026-08-12T06:10:00+00:00", 70.0),  // same session (gap 10m < 30m)
      reading("s1", "2026-08-12T07:30:00+00:00", 60.0))  // new session (gap 80m)
    val q = Streams.sessionStats(mem.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_stats")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sess_stats")
      .select(col("session_window.start").cast("string").as("start"),
        col("readings"), col("min_battery"))
      .orderBy("start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 70.0)
    assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 60.0)
  }

  test("flatMapGroupsWithState emits edge-triggered battery alerts") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = Streams.batteryAlerts(mem.toDS(), threshold = 20.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()
    mem.addData(
      reading("s1", "t1", 50.0), reading("s1", "t2", 15.0), // crossing -> alert
      reading("s1", "t3", 12.0))                            // still low -> no alert
    q.processAllAvailable()
    mem.addData(reading("s1", "t4", 60.0), reading("s1", "t5", 5.0)) // recross -> alert
    q.processAllAvailable()
    q.stop()
    val alerts = spark.table("alerts")
      .orderBy("battery_level").collect()
    assert(alerts.length == 2)
    assert(alerts.map(_.getAs[Double]("battery_level")).toSeq == Seq(5.0, 15.0))
  }

  test("dedupStream drops within-watermark redeliveries, keeps distinct keys") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0),
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0), // redelivery -> dropped
      reading("s2", "2026-08-12T06:00:30+00:00", 70.0),
      reading("s1", "2026-08-12T06:05:00+00:00", 79.0)) // same key, new event time -> kept
    val deduped = Streams.dedupStream(
      mem.toDF().withColumn("event_time",
        to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX")),
      Seq("sensor_id", "event_time"), "event_time", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("dedup_stream")
      .select("sensor_id", "timestamp").orderBy("timestamp", "sensor_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("s1", "s2", "s1"))
  }

  test("stream-stream interval join attributes clicks within the horizon") {
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-08-12 06:$m%02d:00")
    signups.addData((1L, ts(0)), (2L, ts(5)))
    clicks.addData(
      (1L, ts(30)),  // within 1h of user 1's signup -> joined
      (1L, ts(59)),  // also within -> joined
      (2L, ts(4)),   // BEFORE user 2's signup -> dropped
      (3L, ts(10)))  // no signup for user 3 -> dropped
    val joined = Streams.streamIntervalJoin(
      signups.toDF().toDF("s_user", "s_time"), "s_user", "s_time",
      clicks.toDF().toDF("c_user", "c_time"), "c_user", "c_time", "1 hour")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("attrib")
      .select("s_user", "c_time").orderBy("c_time").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 1L))
  }

  test("outer stream-stream interval join null-extends unmatched left rows after watermark") {
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-08-12 06:$m%02d:00")
    signups.addData((1L, ts(0)), (2L, ts(5))) // user 2 never clicks
    clicks.addData((1L, ts(30)))
    val joined = Streams.streamIntervalJoinOuter(
      signups.toDF().toDF("s_user", "s_time"), "s_user", "s_time",
      clicks.toDF().toDF("c_user", "c_time"), "c_user", "c_time", "1 hour")
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    // advance both watermarks far past every join window — only then can
    // the engine prove user 2 has no match. Watermarks move at batch
    // boundaries from the PREVIOUS batch's max event time, so feed two
    // late batches: one carries the new max, the next evicts and emits.
    def nudge(id: Long, t: String): Unit = {
      val stamp = java.sql.Timestamp.valueOf(t)
      signups.addData((id, stamp)); clicks.addData((id, stamp))
      q.processAllAvailable()
    }
    nudge(8L, "2026-08-12 09:00:00")
    nudge(7L, "2026-08-12 10:00:00")
    q.stop()
    val rows = spark.table("attrib_outer")
      .select("s_user", "c_user").orderBy("s_user").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.contains((1L, 1L)), s"matched row missing: ${rows.toSeq}")
    assert(rows.contains((2L, -1L)),
      s"null-extended row for the non-converting signup missing: ${rows.toSeq}")
  }

  test("windowed parquet sink appends a window exactly once, after watermark close") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "winsink").toString
    def run(): Unit = {
      val q = Streams.startWindowedParquetSink(mem.toDF(), s"$root/mv",
        s"$root/chk", "5 minutes", "10 minutes", Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    // batch 1: two readings inside the 06:00-06:05 window; watermark
    // (max event - 10 min) has not passed the window end -> nothing emitted
    mem.addData(
      reading("s1", "2026-08-12T06:01:00+00:00", 80.0, temp = 20.0),
      reading("s1", "2026-08-12T06:04:00+00:00", 80.0, temp = 30.0))
    run()
    // schema-pinned read: the sink directory may hold no data files yet
    val mvSchema = "window_start timestamp, window_end timestamp," +
      "city string, readings long, avg_temp_c double, max_aqi double"
    assert(spark.read.schema(mvSchema).parquet(s"$root/mv").count() == 0,
      "window must not be emitted before the watermark closes it")
    // batch 2: a reading at 06:20 pushes the watermark to 06:10 > 06:05 —
    // the first window is finalized and appended exactly once
    mem.addData(reading("s2", "2026-08-12T06:20:00+00:00", 70.0))
    run()
    val rows = spark.read.parquet(s"$root/mv").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("readings") == 2L)
    assert(r.getAs[Double]("avg_temp_c") == 25.0)
  }

  test("stream-static enrichment join decorates events from a broadcast dim") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val dim = Seq(("click", 1.0), ("view", 2.0)).toDF("event_type", "weight")
    mem.addData((1L, "click"), (2L, "view"), (3L, "scroll"))
    val enriched = Streams.enrichWithDim(
      mem.toDF().toDF("id", "event_type"), dim, Seq("event_type"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("enriched")
      .select("id", "weight").orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    // left join: the unmatched event passes through null-extended
    assert(got == Seq(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
  }

  test("incremental sweep processes only NEW landing files, bounded per trigger") {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "sweep").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/raw"))
    def land(name: String, id: String, day: Int): Unit =
      Files.write(java.nio.file.Paths.get(s"$root/raw/$name"),
        (s"""{"sensor_id":"$id","city":"Tokyo","timestamp":"2026-08-${day}T06:00:00+00:00",""" +
          """"temperature_c":20.0,"humidity_pct":50.0,"aqi":30.0,"battery_level":80.0}""").getBytes)
    def sweep(): Long = {
      val q = Streams.startIncrementalIotSweep(spark, s"$root/raw",
        s"$root/curated", s"$root/chk", maxFilesPerTrigger = 1,
        Trigger.AvailableNow())
      q.awaitTermination(60000)
      val done = q.recentProgress.count(_.numInputRows > 0)
      done.toLong
    }
    land("a.json", "s1", 10); land("b.json", "s2", 11)
    // 2 files, maxFilesPerTrigger=1 -> two 1-file micro-batches
    assert(sweep() == 2L)
    assert(spark.read.parquet(s"$root/curated").count() == 2)
    // second run with one NEW file: only it is processed (checkpointed
    // file tracking — the O(new data) sweep, not the reference's O(all))
    land("c.json", "s3", 12)
    assert(sweep() == 1L)
    val curated = spark.read.parquet(s"$root/curated")
    assert(curated.count() == 3)
    // event-date partitions derived exactly like the batch path
    assert(new java.io.File(s"$root/curated/date=2026-08-12").exists())
  }

  test("health listener records progress and raises error alerts (monitoring analog)") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // delivery seam (SNS-subscriber analog): a file sink, an in-memory
    // sink, and one that always throws — the failing pager must be
    // counted, not kill the listener or block the healthy sinks
    val alertFile = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get("target"), "alerts", ".ndjson")
    val received = new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.Monitoring.Alert]()
    val memSink = new graft.streaming.Monitoring.AlertSink {
      override def deliver(a: graft.streaming.Monitoring.Alert): Unit = received.add(a)
    }
    val deadSink = new graft.streaming.Monitoring.AlertSink {
      override def deliver(a: graft.streaming.Monitoring.Alert): Unit =
        throw new RuntimeException("pager down")
    }
    val listener = graft.streaming.Monitoring.attach(spark, slowBatchMs = 3600000L,
      sinks = Seq(new graft.streaming.Monitoring.FileAlertSink(alertFile.toString),
        memSink, deadSink))
    try {
      // healthy query: progress recorded, no alerts
      val ok = MemoryStream[Long]
      ok.addData(1L, 2L, 3L)
      val q1 = ok.toDF().writeStream.format("memory").queryName("mon_ok")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination(60000)
      // failing query: foreachBatch throws -> terminated-with-exception alert
      val bad = MemoryStream[Long]
      bad.addData(7L)
      val q2 = bad.toDF().writeStream.queryName("mon_bad")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("synthetic failure")
        }.start()
      intercept[Exception] { q2.awaitTermination(60000) }
      // listener bus is async — wait for both signals
      val deadline = System.currentTimeMillis() + 30000
      while ((listener.alerts.isEmpty ||
          !listener.progress.exists(_.query == "mon_ok")) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      val okProg = listener.progress.filter(_.query == "mon_ok")
      assert(okProg.nonEmpty && okProg.map(_.numInputRows).sum == 3L)
      assert(listener.alerts.exists(a => a.kind == "error"),
        s"expected an error alert, got ${listener.alerts}")
      assert(!listener.alerts.exists(_.kind == "slow"))
      // every alert reached every healthy sink; the dead sink only
      // incremented the failure counter
      import scala.jdk.CollectionConverters._
      assert(received.iterator().asScala.exists(_.kind == "error"),
        "in-memory sink did not receive the error alert")
      val fileLines = new String(java.nio.file.Files.readAllBytes(alertFile), "UTF-8")
      assert(fileLines.contains("\"kind\":\"error\""),
        s"file sink did not record the error alert: $fileLines")
      assert(listener.sinkFailures >= 1L, "dead-sink failures not counted")
    } finally spark.streams.removeListener(listener)
  }

  test("webhook alert sink POSTs the alert JSON over a real socket") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/hook", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        bodies.add(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
        x.sendResponseHeaders(200, 2)
        x.getResponseBody.write("ok".getBytes); x.close()
      }
    })
    server.start()
    try {
      val sink = new graft.streaming.Monitoring.HttpAlertSink(
        s"http://127.0.0.1:${server.getAddress.getPort}/hook")
      sink.deliver(graft.streaming.Monitoring.Alert("q1", "error", "boom \"quoted\""))
      val body = bodies.poll()
      assert(body == """{"query":"q1","kind":"error","detail":"boom \"quoted\""}""",
        s"unexpected webhook body: $body")
      // non-2xx surfaces as a failure the listener's counter will absorb
      server.removeContext("/hook")
      server.createContext("/hook", new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          x.sendResponseHeaders(503, -1); x.close()
        }
      })
      intercept[IllegalArgumentException] {
        sink.deliver(graft.streaming.Monitoring.Alert("q1", "slow", "x"))
      }
    } finally server.stop(0)
  }

  test("synthetic stream projection matches the batch generator schema") {
    val batch = graft.operators.Ingest.syntheticIotBatch(spark, Seq("A", "B"), 2, 1)
    assert(batch.columns.sameElements(Array("sensor_id", "city", "timestamp",
      "temperature_c", "humidity_pct", "aqi", "battery_level")))
  }
}
