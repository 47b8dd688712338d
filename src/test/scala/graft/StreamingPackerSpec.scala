package graft

import graft.streaming.{StateBackend, StreamingPacker}
import graft.streaming.StreamingPacker.{Doc, Packed}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming offset packing == the per-queue batch window formulation
  * (packByOffset's rule restricted to one queue), row for row, across
  * micro-batch boundaries.
  */
class StreamingPackerSpec extends SparkSpec {

  import spark.implicits._

  test("streaming packer matches the batch offset rule across batches") {
    implicit val sc = spark.sqlContext
    val budget = 100L
    // queue 1 crosses a pack boundary exactly at the batch split; queue
    // 2's first doc alone exceeds the budget (spans packs 0 and 1)
    val b1 = Seq(
      Doc(1L, 1000000L, 10L, 60L), Doc(1L, 2000000L, 11L, 30L),
      Doc(2L, 1000000L, 20L, 130L))
    val b2 = Seq(
      Doc(1L, 3000000L, 12L, 50L), // starts at 90 -> pack 0
      Doc(1L, 4000000L, 13L, 40L), // starts at 140 -> pack 1
      Doc(2L, 2000000L, 21L, 10L)) // starts at 130 -> pack 1
    val all = b1 ++ b2

    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Packed]()
      val mem = MemoryStream[Doc]
      val q = StreamingPacker.packStream(mem.toDS(), budget)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Packed], _: Long) =>
          batch.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        mem.addData(b1: _*)
        Thread.sleep(150)
        mem.addData(b2: _*)
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (buf.size() < all.size && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(buf.size() == all.size, s"got ${buf.size()} of ${all.size}")
      } finally q.stop()

      val got = buf.toArray(Array.empty[Packed])
        .map(p => p.id -> ((p.start_offset, p.pack_id))).toMap
      assert(got == Map(
        10L -> ((0L, 0L)), 11L -> ((60L, 0L)), 12L -> ((90L, 0L)),
        13L -> ((140L, 1L)),
        20L -> ((0L, 0L)), 21L -> ((130L, 1L))))

      // batch reference: the packByOffset rule as a per-queue window
      val w = Window.partitionBy("queue").orderBy("ts_us", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = all.toDF("queue", "ts_us", "id", "tokens")
        .withColumn("start_offset", sum(col("tokens")).over(w) - col("tokens"))
        .withColumn("pack_id", floor(col("start_offset") / budget).cast("long"))
        .select("id", "start_offset", "pack_id")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want, s"stream/batch divergence: $got vs $want")
    }
  }
}
