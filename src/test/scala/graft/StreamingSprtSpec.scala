package graft

import graft.operators.Experiment
import graft.streaming.{StateBackend, StreamingSprt}
import graft.streaming.StreamingSprt.{Obs, Status}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming SPRT == the batch exp4 operator: identical first
  * crossing under any batch split (including a crossing mid-batch and
  * one exactly at a batch boundary), pre-crossing LLRs equal to the
  * batch prefix sums, and the frozen-decision contract after crossing.
  */
class StreamingSprtSpec extends SparkSpec {

  import spark.implicits._

  // p0=0.25 vs p1=0.75: +/-ln3 x1e9 increments, +/-ln19 x1e9 bounds —
  // three same-direction observations cross (the TrainerSpec fixture)
  private val (ws, _, up, lo) = Experiment.sprtConstants(0.25, 0.75, 0.05, 0.05)

  private def run(batches: Seq[Seq[Obs]]): Seq[Status] = {
    implicit val sc = spark.sqlContext
    val total = batches.map(_.size).sum
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Status]()
    val mem = MemoryStream[Obs]
    StateBackend.withRocksDb(spark) {
      val q = StreamingSprt.sprtStream(mem.toDS(), 0.25, 0.75)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Status], _: Long) =>
          b.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        // sleep-poll between batches, NOT processAllAvailable: the
        // latter parks forever against transformWithState queries here
        // (observed; the StreamingCusumSpec pattern). If a batch is
        // still in flight when the next addData lands, the rows merge
        // into one micro-batch — parity is order-based, so that only
        // makes the split less adversarial, never wrong.
        var fed = 0
        batches.foreach { b =>
          mem.addData(b: _*)
          fed += b.size
          val d = System.nanoTime() + 60L * 1000000000L
          while (buf.size() < fed && System.nanoTime() < d)
            Thread.sleep(100)
        }
        assert(buf.size() == total, s"got ${buf.size()} of $total")
      } finally q.stop()
    }
    buf.toArray(Array.empty[Status]).toSeq.sortBy(s => (s.arm, s.ord))
  }

  test("first crossing matches batch sprt under any batch split; LLR prefix-exact before it") {
    // arm 0 crosses UP at ord 3 (mid-batch and at-boundary splits both
    // exercised); arm 1 alternates and never decides
    val obs =
      (1L to 5L).map(i => Obs(0L, i, success = true)) ++
        (1L to 6L).map(i => Obs(1L, i + 10, i % 2 == 1))
    val splits = Seq(
      Seq(obs.take(4), obs.slice(4, 8), obs.drop(8)), // crossing mid-batch 1
      Seq(obs.take(2), obs.slice(2, 3), obs.drop(3)), // crossing closes batch 2
      Seq(obs)) // single batch
    val batchOut = Experiment.sprt(
      obs.toDF("arm", "ord", "big"), "arm", "ord", col("big"), 0.25, 0.75)
      .orderBy("arm").collect()
    assert(batchOut(0).getString(2) == "accept_h1" &&
      batchOut(0).getLong(3) == 3L)
    assert(batchOut(1).getString(2) == "continue")
    for (split <- splits) {
      val got = run(split)
      // arm 0: walks 1,2 then freezes at the ord-3 crossing tuple
      val a0 = got.filter(_.arm == 0L)
      assert(a0.map(_.llr_x1e9).take(3) == Seq(ws, 2 * ws, 3 * ws))
      assert(a0(2).decision == "accept_h1" && a0(2).at_order == 3L,
        s"crossing drifted: ${a0(2)}")
      assert(a0.drop(2).forall(s =>
        s.decision == "accept_h1" && s.at_order == 3L &&
          s.llr_x1e9 == 3 * ws),
        "post-crossing rows must emit the FROZEN tuple")
      assert(a0(2).at_order == batchOut(0).getLong(3) &&
        a0(2).llr_x1e9 == batchOut(0).getLong(4))
      // arm 1: never decides; llr oscillates exactly +/- one increment
      val a1 = got.filter(_.arm == 1L)
      assert(a1.forall(_.decision == "continue"))
      assert(a1.map(_.llr_x1e9) == Seq(ws, 0L, ws, 0L, ws, 0L))
      assert(a1.forall(s => s.at_order == s.ord))
    }
  }

  test("a duplicate or late ord across micro-batches FAILS the query (order contract enforced)") {
    // round-14 advisory: rows are sorted only within a batch, so a late
    // ord used to walk the LLR in the wrong position silently; the max
    // processed ord now rides in state and the walk fail-fasts instead
    implicit val sc = spark.sqlContext
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Status]()
    val mem = MemoryStream[Obs]
    StateBackend.withRocksDb(spark) {
      val q = StreamingSprt.sprtStream(mem.toDS(), 0.25, 0.75)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Status], _: Long) =>
          b.collect().foreach(buf.add); ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        mem.addData(Obs(0L, 5L, success = true))
        var d = System.nanoTime() + 60L * 1000000000L
        while (buf.size() < 1 && System.nanoTime() < d) Thread.sleep(100)
        assert(buf.size() == 1, "first batch must process cleanly")
        // ord 3 arrives AFTER ord 5 was processed — must fail, not walk
        mem.addData(Obs(0L, 3L, success = true))
        d = System.nanoTime() + 60L * 1000000000L
        while (q.exception.isEmpty && System.nanoTime() < d)
          Thread.sleep(100)
        assert(q.exception.isDefined, "late ord must fail the query")
        val msg = q.exception.get.toString
        assert(msg.contains("at or before the max ord"),
          s"unexpected failure: $msg")
      } finally if (q.isActive) q.stop()
    }
  }

  test("boundary values: a walk landing exactly on the bound decides (>= / <= contract)") {
    // sanity on the closed bounds both faces share: up/lo are the
    // quantized constants themselves, so llr == up decides h1
    assert(up == -lo)
    assert(3 * ws >= up && 2 * ws < up,
      "fixture must cross exactly on the third observation")
  }
}
