package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of the w13 last-touch attribution query: the batch
  * formulation's per-user running ignore-nulls window carry becomes ONE
  * long of per-key `ValueState` (the latest click's event time) crossed
  * via `transformWithState` — live conversion crediting at the arrival
  * edge instead of a nightly window pass.
  *
  * PARITY CONTRACT (spec-pinned, same contract as [[StreamingEwma]] /
  * [[StreamingCusum]]): with micro-batches arriving in event-time
  * order, the emitted (purchase → credited click) pairs match the
  * batch window query row for row — attribution depends only on the
  * ordered per-user prefix, rows are processed in (ts, id) order
  * within each batch, and the lookback compare is exact integer
  * microseconds. Purchases with no in-window click are emitted with
  * `click_us = -1` (the batch face's unattributed rows) so the stream
  * is also the denominator of a live conversion rate.
  *
  * State is ONE long per user — bounded by active users, not events;
  * `stateTtl` evicts idle users in-store (the RocksDB-backed path),
  * which is also semantically safe for any TTL ≥ the lookback window:
  * an evicted click could never be credited again anyway.
  */
object StreamingAttribution {

  case class Event(user: Long, ts_us: Long, id: Long, kind: String, cents: Long)
  case class Credit(user: Long, id: Long, ts_us: Long, click_us: Long, cents: Long)

  def attributionStream(events: Dataset[Event], lookbackUs: Long,
      stateTtl: Option[java.time.Duration] = None): Dataset[Credit] = {
    import events.sparkSession.implicits._
    require(lookbackUs > 0, "lookback must be positive")
    events
      .groupByKey(_.user)
      .transformWithState(new AttributionProcessor(lookbackUs, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class AttributionProcessor(lookbackUs: Long,
      stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Event, Credit] {
    @transient private var lastClick: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastClick = getHandle.getValueState[Long]("lastClick",
        org.apache.spark.sql.Encoders.scalaLong,
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Credit] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.id))
      var click = if (lastClick.exists()) lastClick.get() else -1L
      val out = sorted.flatMap { e =>
        e.kind match {
          case "click" =>
            click = e.ts_us; None
          case "purchase" =>
            val credited = click >= 0L && e.ts_us - click <= lookbackUs
            Some(Credit(user, e.id, e.ts_us,
              if (credited) click else -1L, e.cents))
          case _ => None
        }
      }
      if (click >= 0L) lastClick.update(click)
      out.iterator
    }
  }
}
