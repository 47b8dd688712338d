package graft

import graft.streaming.{StateBackend, Streams}
import graft.streaming.Streams.Reading
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The state-store seam: the stateful operators must produce identical
  * results under the RocksDB provider (the at-scale backend — state on
  * executor-local disk, not heap) as under Spark's default heap-backed
  * provider, and the RocksDB/changelog path must demonstrably engage
  * (checkpoint artifacts prove which provider ran — `.changelog` files
  * exist only on the RocksDB changelog-checkpointing path; the default
  * provider writes `.delta` snapshots).
  */
class StateBackendSpec extends SparkSpec {

  import spark.implicits._

  private def reading(id: String, ts: String, battery: Double) =
    Reading(id, "Tokyo", ts, 25.0, 50.0, 40.0, battery)

  private def drainDedup(queryName: String, checkpoint: String): Seq[String] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0),
      reading("s1", "2026-08-12T06:00:00+00:00", 80.0), // redelivery -> dropped
      reading("s2", "2026-08-12T06:00:30+00:00", 70.0),
      reading("s1", "2026-08-12T06:05:00+00:00", 79.0)) // new event time -> kept
    val deduped = Streams.dedupStream(
      mem.toDF().withColumn("event_time",
        to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX")),
      Seq("sensor_id", "event_time"), "event_time", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(queryName)
      .select("sensor_id", "timestamp").orderBy("timestamp", "sensor_id")
      .collect().map(_.getString(0)).toSeq
  }

  private def stateFiles(checkpoint: String, suffix: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(checkpoint, "state")).filter(_.getName.endsWith(suffix))
  }

  test("dedupStream is backend-agnostic: RocksDB result == default result") {
    val ckDefault = Files.createTempDirectory("ck_default").toString
    val ckRocks = Files.createTempDirectory("ck_rocks").toString

    val viaDefault = drainDedup("sb_dedup_default", ckDefault)
    val viaRocks = StateBackend.withRocksDb(spark) {
      drainDedup("sb_dedup_rocks", ckRocks)
    }

    assert(viaDefault == Seq("s1", "s2", "s1"))
    assert(viaRocks == viaDefault, "state backend must not change semantics")

    // the artifacts prove which provider actually ran each query
    assert(stateFiles(ckDefault, ".delta").nonEmpty,
      "default provider must write .delta state files")
    assert(stateFiles(ckRocks, ".changelog").nonEmpty,
      "RocksDB changelog checkpointing must write .changelog files")
  }

  test("withRocksDb restores the previous backend after the block") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StateBackend.withRocksDb(spark) {
      assert(spark.conf.get(key) == StateBackend.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) == before)
  }

  // NOTE: TWS tests poll a foreachBatch buffer, never
  // processAllAvailable — under TimeMode.ProcessingTime Spark runs a
  // batch EVERY trigger (TTL/timer eviction happens on empty batches
  // too), so the no-new-data quiescence processAllAvailable waits for
  // never arrives and it blocks forever (and AvailableNow never
  // self-terminates, for the same reason). One continuous query per
  // test; the buffer records every update emitted for s1, in order.
  private def pollFor(buf: java.util.Queue[(Long, Double)],
      want: ((Long, Double)) => Boolean, what: String): (Long, Double) = {
    val deadline = System.currentTimeMillis + 60000
    while (System.currentTimeMillis < deadline) {
      val hit = buf.toArray(Array.empty[(Long, Double)]).find(want)
      if (hit.isDefined) return hit.get
      Thread.sleep(100)
    }
    fail(s"timed out waiting for $what; saw ${buf.toArray.toSeq}")
  }

  private def startTws(mem: MemoryStream[Reading], ttl: Option[java.time.Duration],
      buf: java.util.Queue[(Long, Double)]) =
    Streams.sensorHealthTws(mem.toDS(), stateTtl = ttl)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.SensorHealth], _: Long) =>
        batch.filter(col("sensor_id") === "s1")
          .select("readings", "min_battery").collect()
          .foreach(r => buf.add((r.getLong(0), r.getDouble(1))))
        ()
      }
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()

  test("transformWithState sensor health carries state across batches") {
    implicit val sc = spark.sqlContext
    StateBackend.withRocksDb(spark) { // TWS requires RocksDB
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
      val mem = MemoryStream[Reading]
      val q = startTws(mem, ttl = None, buf)
      try {
        mem.addData(reading("s1", "t1", 50.0), reading("s1", "t2", 30.0))
        assert(pollFor(buf, _._1 == 2L, "batch-1 fold")._2 == 30.0)
        mem.addData(reading("s1", "t3", 10.0))
        // readings reaches 3 only if batch-1 state carried over
        assert(pollFor(buf, _._1 == 3L, "carried state")._2 == 10.0)
      } finally q.stop()
    }
  }

  test("transformWithState TTL evicts idle keys; counters restart on next sight") {
    implicit val sc = spark.sqlContext
    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
      val mem = MemoryStream[Reading]
      val q = startTws(mem, ttl = Some(java.time.Duration.ofMillis(500)), buf)
      try {
        mem.addData(reading("s1", "t1", 50.0), reading("s1", "t2", 40.0))
        assert(pollFor(buf, _._1 == 2L, "batch-1 fold")._2 == 40.0)
        Thread.sleep(1500) // > TTL: s1's state expires while idle
        mem.addData(reading("s1", "t3", 30.0))
        // an evicted key restarts its rolling counters (readings=1,
        // fresh min 30) instead of carrying (3, min 30) forward
        val next = pollFor(buf, p => p._1 == 1L || p._1 == 3L, "post-TTL update")
        assert(next == (1L, 30.0),
          s"expected counters to restart after TTL eviction, got $next")
      } finally q.stop()
    }
  }

  test("sessionization under RocksDB matches the documented session split") {
    val ck = Files.createTempDirectory("ck_rocks_sess").toString
    implicit val sc = spark.sqlContext
    val sessions = StateBackend.withRocksDb(spark) {
      val mem = MemoryStream[Reading]
      mem.addData(
        reading("s1", "2026-08-12T06:00:00+00:00", 80.0),
        reading("s1", "2026-08-12T06:10:00+00:00", 70.0), // same session (gap 10m < 30m)
        reading("s1", "2026-08-12T07:30:00+00:00", 60.0)) // new session (gap 80m)
      val q = Streams.sessionStats(mem.toDF(), "30 minutes", "10 minutes")
        .writeStream.format("memory").queryName("sb_sessions")
        .option("checkpointLocation", ck)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.table("sb_sessions")
        .select(col("session_window.start").cast("string").as("start"),
          col("readings"), col("min_battery"))
        .orderBy("start").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    }
    assert(sessions == Seq((2L, 70.0), (1L, 60.0)),
      s"expected sessions of (2 readings, min 70) then (1, 60), got $sessions")
  }

  test("streaming EWMA == batch ewmaSmooth when batches arrive in event-time order") {
    import graft.streaming.StreamingEwma
    import graft.streaming.StreamingEwma.{Point, Smoothed}
    implicit val sc = spark.sqlContext
    // two keys, five points each; values exercise negatives + truncation
    def pts(lo: Int, hi: Int) = for {
      k <- Seq(1L, 2L); i <- lo to hi
    } yield Point(k, i.toLong * 1000000L, k * 100L + i,
      (if (i % 2 == 0) 1 else -1) * (k * 300L + i * 17L))
    val all = pts(1, 5)
    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Smoothed]()
      val mem = MemoryStream[Point]
      val q = StreamingEwma.ewmaStream(mem.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Smoothed], _: Long) =>
          batch.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        mem.addData(pts(1, 3): _*) // first micro-batch: earlier event times
        Thread.sleep(100)
        mem.addData(pts(4, 5): _*) // later times in a later batch
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (buf.size() < all.size && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(buf.size() == all.size, s"got ${buf.size()} of ${all.size}")
      } finally q.stop()
      // batch face on the union of both micro-batches
      import java.sql.Timestamp
      val batchDf = all.map(p =>
          (p.key, new Timestamp(p.ts_us / 1000L), p.id, p.xs.toDouble / 100.0))
        .toDF("user_id", "ts", "event_id", "value")
      val want = graft.operators.Timeseries
        .ewmaSmooth(batchDf, "user_id", "ts", "event_id", "value")
        .select("event_id", "ewma_scaled")
        .as[(Long, Long)].collect().toMap
      val got = buf.toArray(Array.empty[Smoothed])
        .map(s => s.id -> s.ewma_scaled).toMap
      assert(got == want, s"stream/batch divergence: $got vs $want")
    }
  }
}
