package graft

import graft.streaming.{StateBackend, StreamingAttribution}
import graft.streaming.StreamingAttribution.{Credit, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming last-touch attribution == the w13 batch window carry, row
  * for row, across micro-batch boundaries; lookback expiry and
  * click-less purchases emit unattributed (-1) rows.
  */
class StreamingAttributionSpec extends SparkSpec {

  import spark.implicits._

  private val LookbackUs = 10L * 1000000L // 10 s

  private def collectCredits(batches: Seq[Seq[Event]], expect: Int): Seq[Credit] = {
    implicit val sc = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Credit]()
    val mem = MemoryStream[Event]
    val q = StreamingAttribution.attributionStream(mem.toDS(), LookbackUs)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Credit], _: Long) =>
        batch.collect().foreach(buf.add); ()
      }
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      batches.foreach { b => mem.addData(b: _*); Thread.sleep(150) }
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (buf.size() < expect && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(buf.size() == expect, s"got ${buf.size()} of $expect")
    } finally q.stop()
    buf.toArray(Array.empty[Credit]).toSeq
  }

  test("streaming attribution matches the batch window carry across batches") {
    def ev(user: Long, sec: Long, id: Long, kind: String, cents: Long = 0L) =
      Event(user, sec * 1000000L, id, kind, cents)
    // user 1: click(1) -> purchase(3, credited 1) -> click(5) ->
    //   purchase(20, 15s after click 5: expired) in the SECOND batch
    // user 2: purchase(2) with no prior click; click(4); purchase(8, credited 4)
    val b1 = Seq(
      ev(1, 1, 10, "click"), ev(1, 3, 11, "purchase", 500),
      ev(1, 5, 12, "click"),
      ev(2, 2, 20, "purchase", 300), ev(2, 4, 21, "click"))
    val b2 = Seq(
      ev(1, 20, 13, "purchase", 700),
      ev(2, 8, 22, "purchase", 900),
      ev(2, 9, 23, "view"))

    StateBackend.withRocksDb(spark) {
      val got = collectCredits(Seq(b1, b2), expect = 4)
        .map(c => c.id -> c.click_us).toMap
      assert(got == Map(
        11L -> 1000000L,  // credited to click at 1s
        20L -> -1L,       // no prior click
        13L -> -1L,       // click at 5s expired by 20s (15s > 10s lookback)
        22L -> 4000000L)) // credited across the batch boundary

      // batch reference: the w13 running ignore-nulls carry
      val all = (b1 ++ b2).toDF("user", "ts_us", "id", "kind", "cents")
      val w = Window.partitionBy("user").orderBy("ts_us", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = all
        .withColumn("click_us",
          last(when(col("kind") === "click", col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("kind") === "purchase")
        .withColumn("credit",
          when(col("click_us").isNotNull &&
            col("ts_us") - col("click_us") <= LookbackUs, col("click_us"))
            .otherwise(-1L))
        .select("id", "credit").as[(Long, Long)].collect().toMap
      assert(got == want, s"stream/batch divergence: $got vs $want")
    }
  }

  test("same-timestamp click and purchase resolve by id order") {
    // click id 1 sorts before purchase id 2 at the same ts -> credited
    val evs = Seq(
      Event(7L, 1000000L, 1L, "click", 0L),
      Event(7L, 1000000L, 2L, "purchase", 100L))
    StateBackend.withRocksDb(spark) {
      val got = collectCredits(Seq(evs), expect = 1).head
      assert(got.click_us == 1000000L && got.cents == 100L)
    }
  }
}
