package graft

import graft.operators.Trainer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Preference-pair mining's STREAMING face is the SAME operator code:
  * `Trainer.preferencePairs` is one keyed aggregation (max/min struct
  * extremes, a running count) plus a post-aggregation filter and
  * projection — every piece streaming-compatible (no sort, no window,
  * no collect) — so a `readStream` response log runs through the
  * identical function under `complete` output mode with O(prompts)
  * state: the live view of "which pairs would DPO train on right now".
  * This spec pins the claim: the final streaming snapshot equals the
  * batch result row-for-row regardless of the micro-batch split —
  * including a pair whose CHOSEN response only arrives in a later
  * micro-batch than its first sibling (the state-carry case), and a
  * prompt that only becomes pair-eligible (≥2 responses, margin ≥ 1)
  * mid-stream.
  */
class StreamingDpoSpec extends SparkSpec {

  import spark.implicits._

  test("streaming complete-mode preference pairs == batch, any batch split") {
    implicit val sc = spark.sqlContext
    // (prompt, response, score): prompt 1's best response arrives in
    // batch 3; prompt 2 is a singleton until batch 2; prompt 3 stays
    // zero-margin throughout (never emitted)
    val all: Seq[(Long, Long, Long)] = Seq(
      (1L, 10L, 5L), (2L, 20L, 7L), (3L, 30L, 4L),
      (1L, 11L, 9L), (2L, 21L, 3L), (3L, 31L, 4L),
      (1L, 12L, 9L), (2L, 22L, 7L))
    val batches = Seq(all.take(3), all.slice(3, 6), all.drop(6))

    val mem = MemoryStream[(Long, Long, Long)]
    val streamed = Trainer.preferencePairs(
      mem.toDS().toDF("prompt", "resp", "sc"), "prompt", "resp", "sc")
    val q = streamed.writeStream
      .format("memory").queryName("dpo_snapshot")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    val got = spark.table("dpo_snapshot")
      .orderBy("prompt")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Trainer.preferencePairs(all.toDF("prompt", "resp", "sc"),
        "prompt", "resp", "sc")
      .orderBy("prompt")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"streaming snapshot diverged from batch:\n  got  $got\n  want $want")
    // prompt 2's extremes: responses 20 and 22 tie at score 7 — the
    // struct tie-break picks the LARGER response id, 22
    assert(want == Seq((1L, 12L, 10L, 4L), (2L, 22L, 21L, 4L)))
  }
}
