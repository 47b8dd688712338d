package graft

import graft.streaming.{StateBackend, StreamingCusum}
import graft.streaming.StreamingCusum.{Cusum, Point}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CUSUM == the batch prefix-sum/prefix-min windows (the an4
  * formulation), row for row, across micro-batch boundaries.
  */
class StreamingCusumSpec extends SparkSpec {

  import spark.implicits._

  test("streaming CUSUM matches the batch window formulation across batches") {
    implicit val sc = spark.sqlContext
    val k = 40L
    // two keys; values swing around k so the running min actually moves
    def pts(lo: Int, hi: Int) = for {
      key <- Seq(1L, 2L); i <- lo to hi
    } yield Point(key, i.toLong * 1000000L, key * 100L + i,
      (if (i % 3 == 0) -1 else 1) * (key * 25L + i * 13L))
    val all = pts(1, 6)

    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Cusum]()
      val mem = MemoryStream[Point]
      val q = StreamingCusum.cusumStream(mem.toDS(), k)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Cusum], _: Long) =>
          batch.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        mem.addData(pts(1, 4): _*)
        Thread.sleep(100)
        mem.addData(pts(5, 6): _*)
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (buf.size() < all.size && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(buf.size() == all.size, s"got ${buf.size()} of ${all.size}")
      } finally q.stop()

      // batch reference: the an4 windows over the union of both batches
      val w = Window.partitionBy("key").orderBy("ts_us", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = all.toDF("key", "ts_us", "id", "vs")
        .withColumn("r", sum(col("vs") - lit(k)).over(w))
        .withColumn("cusum", col("r") - least(min(col("r")).over(w), lit(0L)))
        .select("id", "cusum").as[(Long, Long)].collect().toMap
      val got = buf.toArray(Array.empty[Cusum]).map(c => c.id -> c.cusum).toMap
      assert(got == want, s"stream/batch divergence: $got vs $want")
    }
  }

  test("cusum statistic is non-negative and resets after deep drawdown") {
    implicit val sc = spark.sqlContext
    // one key: big negative run then positive run; the min-tracking must
    // floor the statistic at 0 during the drawdown and measure only the
    // post-trough rise afterwards
    val vals = Seq(-50L, -50L, -50L, 10L, 10L, 10L)
    val points = vals.zipWithIndex.map { case (v, i) =>
      Point(9L, i.toLong * 1000000L, i.toLong, v)
    }
    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Cusum]()
      val mem = MemoryStream[Point]
      val q = StreamingCusum.cusumStream(mem.toDS(), 0L)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Cusum], _: Long) =>
          batch.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        mem.addData(points: _*)
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (buf.size() < points.size && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(buf.size() == points.size)
      } finally q.stop()
      val byId = buf.toArray(Array.empty[Cusum]).map(c => c.id -> c.cusum).toMap
      assert(byId.values.forall(_ >= 0L), s"cusum must be non-negative: $byId")
      assert(byId(2L) == 0L, "statistic floors at 0 through the drawdown")
      assert(byId(5L) == 30L, "post-trough rise measured from the minimum")
    }
  }
}
