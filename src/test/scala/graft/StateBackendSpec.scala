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
}
