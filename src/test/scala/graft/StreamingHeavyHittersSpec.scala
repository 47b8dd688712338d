package graft

import graft.streaming.{StateBackend, StreamingHeavyHitters}
import graft.streaming.StreamingHeavyHitters.{Item, Summary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming Misra-Gries == the batch aggregate's guarantees, carried
  * across micro-batch boundaries: exact when distinct ≤ k (so batch
  * parity is bit-for-bit however the rows are split), and the classic
  * MG bounds when the domain overflows k.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def run(batches: Seq[Seq[Item]], k: Int): Map[Long, Summary] = {
    implicit val sc = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Summary]()
    val mem = MemoryStream[Item]
    val q = StreamingHeavyHitters.heavyHittersStream(mem.toDS(), k)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Summary], _: Long) =>
        batch.collect().foreach(buf.add); ()
      }
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    // processed-row count = per-key max of the RUNNING total n
    def processed(): Long = {
      val arr = buf.toArray(Array.empty[Summary])
      if (arr.isEmpty) 0L
      else arr.groupBy(_.key).values.map(_.map(_.n).max).sum
    }
    try {
      var fed = 0
      for (b <- batches) {
        mem.addData(b: _*)
        fed += b.size
        // wait for this feed's summaries before the next, so the split
        // across micro-batches is real, not racy
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (processed() < fed && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(processed() == fed, s"stream stalled at ${processed()} of $fed rows")
      }
    } finally q.stop()
    // latest view per key = the summary with the largest running total
    buf.toArray(Array.empty[Summary]).groupBy(_.key)
      .view.mapValues(_.maxBy(_.n)).toMap
  }

  test("distinct <= k: streaming summary is exact and equals batch counts across any split") {
    val rows = for {
      key <- Seq(1L, 2L); i <- 1 to 30
    } yield Item(key, s"item_${key}_${i % 3}") // 3 distinct per key
    StateBackend.withRocksDb(spark) {
      val got = run(Seq(rows.take(20), rows.drop(20)), k = 5)
      for (key <- Seq(1L, 2L)) {
        val want = rows.filter(_.key == key).groupBy(_.item)
          .view.mapValues(_.size.toLong).toMap
        assert(got(key).n == 30L)
        assert(got(key).items.toMap == want,
          s"key $key: exact regime must match batch counts: ${got(key)}")
        // presentation order: count DESC, item ASC
        assert(got(key).items == got(key).items.sortBy { case (it, c) => (-c, it) })
      }
    }
  }

  test("overflowing domain: MG bounds hold and the dominant item survives") {
    // one key, k=2: 60 of "hot", 50 distinct singletons interleaved
    val hot = Seq.fill(60)(Item(7L, "hot"))
    val noise = (1 to 50).map(i => Item(7L, s"noise_$i"))
    val rows = hot.zipAll(noise.map(Some(_)), Item(7L, "hot"), None)
      .flatMap { case (h, n) => Seq(h) ++ n.toSeq }
    StateBackend.withRocksDb(spark) {
      val got = run(Seq(rows.take(40), rows.drop(40)), k = 2)(7L)
      assert(got.n == 110L)
      val est = got.items.toMap
      // any item with true count > n/(k+1) = 36.7 must be present
      assert(est.contains("hot"), s"dominant item lost: $got")
      // lower-bound property: estimate <= true, true - n/(k+1) <= estimate
      assert(est("hot") <= 60L && est("hot") >= 60L - 110L / 3L,
        s"MG bound violated for hot: $got")
      assert(got.items.size <= 2, "state must stay capped at k counters")
    }
  }
}
