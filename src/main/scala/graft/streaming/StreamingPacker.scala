package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of [[graft.operators.Packing.packByOffset]]: offset
  * packing of arriving documents into fixed-token-budget training /
  * inference sequences, per queue, at the arrival edge — the batch
  * face's distributed prefix-sum becomes ONE long of per-key
  * `ValueState` (the queue's running token offset) crossed via
  * `transformWithState`.
  *
  * Same assignment rule as the batch face: a document starting at
  * running offset s lands in pack ⌊s / budget⌋ — so packs fill to the
  * budget with documents split across pack BOUNDARIES by offset, never
  * re-ordered (the deterministic "offset packing" recipe; first-fit
  * reshuffling would make results arrival-order-dependent in a way no
  * oracle could replay).
  *
  * PARITY CONTRACT (spec-pinned, the [[StreamingEwma]] /
  * [[StreamingCusum]] contract): with micro-batches arriving in
  * event-time order, every (doc → start_offset, pack_id) matches the
  * batch face restricted to the same queue and order, row for row —
  * the offset depends only on the ordered per-queue prefix of token
  * counts, rows are processed in (ts, id) order within each batch, and
  * everything is exact integers.
  *
  * State is ONE long per queue; `stateTtl` evicts idle queues in-store
  * (RocksDB-backed path) — eviction resets that queue's packing at 0,
  * the right semantics for a queue that has been drained.
  */
object StreamingPacker {

  case class Doc(queue: Long, ts_us: Long, id: Long, tokens: Long)
  case class Packed(queue: Long, id: Long, start_offset: Long, pack_id: Long)

  def packStream(docs: Dataset[Doc], budget: Long,
      stateTtl: Option[java.time.Duration] = None): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    require(budget >= 1, "budget must be >= 1")
    docs
      .groupByKey(_.queue)
      .transformWithState(new PackProcessor(budget, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class PackProcessor(budget: Long,
      stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Doc, Packed] {
    @transient private var offset: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      offset = getHandle.getValueState[Long]("offset",
        org.apache.spark.sql.Encoders.scalaLong,
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(queue: Long, rows: Iterator[Doc],
        timers: TimerValues): Iterator[Packed] = {
      val sorted = rows.toArray.sortBy(d => (d.ts_us, d.id))
      var s = if (offset.exists()) offset.get() else 0L
      val out = sorted.map { d =>
        val start = s
        s += d.tokens
        Packed(queue, d.id, start, start / budget)
      }
      if (sorted.nonEmpty) offset.update(s)
      out.iterator
    }
  }
}
