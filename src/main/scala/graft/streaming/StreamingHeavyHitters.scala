package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of the a9 Misra-Gries heavy-hitters sketch: the
  * batch [[graft.functions.HeavyHittersAgg]]'s ≤ k counters become
  * per-key `ValueState` carried across micro-batches via
  * `transformWithState` — the live-monitoring shape (dominant URLs /
  * event types / error codes on an unbounded stream) of the same
  * algorithm, with the same guarantees.
  *
  * State per key is the MG invariant: at most `k` (item, count)
  * counters plus the processed-row total `n`. Each arriving row
  * increments its item's counter or, when all `k` slots are taken,
  * decrements every counter (dropping zeros) — identical transition
  * function to the batch aggregate's update path, so the classic
  * bounds carry over verbatim: for every item,
  * `true_count − n/(k+1) ≤ estimate ≤ true_count`, and any item with
  * true_count > n/(k+1) is present. When a key sees at most `k`
  * distinct items the summary is EXACT and therefore batch-parity is
  * bit-for-bit (spec-pinned): splitting the same rows across any
  * number of micro-batches cannot change a count, because no decrement
  * ever fires.
  *
  * Each micro-batch emits the key's current summary (count DESC, item
  * ASC — the batch aggregate's presentation order) with the running
  * total, so the sink always holds the latest view. State is O(k) per
  * key — safe under unbounded item domains, which is the entire point
  * of MG over a `groupBy(item).count()` whose distinct set is
  * corpus-sized. Optional TTL bounds the key domain itself.
  */
object StreamingHeavyHitters {

  case class Item(key: Long, item: String)
  case class Summary(key: Long, n: Long, items: Seq[(String, Long)])

  def heavyHittersStream(rows: Dataset[Item], k: Int,
      stateTtl: Option[java.time.Duration] = None): Dataset[Summary] = {
    require(k > 0, "k must be positive")
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.key)
      .transformWithState(new MgProcessor(k, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class MgProcessor(k: Int, stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Item, Summary] {
    // (processed-row total n, the ≤ k MG counters)
    @transient private var state: ValueState[(Long, Map[String, Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Map[String, Long])]("mg",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.kryo[Map[String, Long]]),
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Item],
        timers: TimerValues): Iterator[Summary] = {
      var (n, counters) =
        if (state.exists()) state.get() else (0L, Map.empty[String, Long])
      var any = false
      rows.foreach { r =>
        if (r.item != null) {
          any = true
          n += 1
          counters.get(r.item) match {
            case Some(c) => counters = counters.updated(r.item, c + 1)
            case None if counters.size < k => counters = counters.updated(r.item, 1L)
            case None =>
              // decrement-all step: the MG trade that caps state at k
              counters = counters.view.mapValues(_ - 1).filter(_._2 > 0).toMap
          }
        }
      }
      if (!any) Iterator.empty
      else {
        state.update((n, counters))
        Iterator.single(Summary(key, n,
          counters.toSeq.sortBy { case (item, c) => (-c, item) }))
      }
    }
  }
}
