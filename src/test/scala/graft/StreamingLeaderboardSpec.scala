package graft

import graft.operators.Trainer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The win-rate leaderboard's STREAMING face is the SAME operator code:
  * `Trainer.winRateLeaderboard` is a union + keyed aggregation +
  * map-side projection — every piece streaming-compatible (no sort, no
  * limit, no collect) — so a `readStream` comparison log runs through
  * the identical function under `complete` output mode with O(items)
  * state. This spec pins that claim: the final streaming snapshot must
  * equal the batch result row-for-row (integer rates exactly; Wilson
  * doubles bit-for-bit — both faces execute the same Column tree), no
  * matter how the log is split across micro-batches.
  */
class StreamingLeaderboardSpec extends SparkSpec {

  import spark.implicits._

  test("streaming complete-mode leaderboard == batch winRateLeaderboard, any batch split") {
    implicit val sc = spark.sqlContext
    // the TrainerSpec motivating design: a well-measured 70% item, its
    // 30% counterpart, and a lucky 2/2 — split across 3 micro-batches
    val all: Seq[(Long, Long)] =
      Seq.fill(70)((1L, 0L)) ++ Seq.fill(30)((0L, 1L)) ++ Seq.fill(2)((9L, 0L))
    val batches = Seq(all.take(20), all.slice(20, 75), all.drop(75))

    val mem = MemoryStream[(Long, Long)]
    val streamed = Trainer.winRateLeaderboard(
      mem.toDS().toDF("winner", "loser"), "winner", "loser")
    val q = streamed.writeStream
      .format("memory").queryName("lb_snapshot")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // one processAllAvailable per addData forces a REAL micro-batch
    // boundary between the three chunks — the state carry is the claim
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    val got = spark.table("lb_snapshot")
      .orderBy("item")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val want = Trainer.winRateLeaderboard(all.toDF("winner", "loser"),
        "winner", "loser")
      .orderBy("item")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == want,
      s"streaming snapshot diverged from batch:\n  got  $got\n  want $want")
    assert(want.map(_._1) == Seq(0L, 1L, 9L))
  }
}
