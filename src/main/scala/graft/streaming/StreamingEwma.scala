package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of [[graft.operators.Timeseries.ewmaSmooth]]: the same
  * integer recurrence e = (x + (d−1)·e) div d carried as per-key
  * `ValueState` across micro-batches via `transformWithState` (RocksDB
  * state store; [[StateBackend.useRocksDb]]).
  *
  * PARITY CONTRACT (spec-pinned): feeding a stream whose micro-batches
  * arrive in event-time order produces row-for-row the batch operator's
  * output — the smoothed value depends only on the ordered prefix, and
  * both faces process rows in (ts, id) order (the processor sorts
  * WITHIN each batch; ACROSS batches the arrival order is the
  * pipeline's ordering contract, same as any stateful stream). State is
  * one long per live key; an optional TTL bounds the key domain the
  * same way [[Streams.sensorHealthTws]] documents.
  */
object StreamingEwma {

  case class Point(key: Long, ts_us: Long, id: Long, xs: Long)
  case class Smoothed(key: Long, id: Long, v_scaled: Long, ewma_scaled: Long)

  def ewmaStream(points: Dataset[Point], alphaDen: Int = 4,
      stateTtl: Option[java.time.Duration] = None): Dataset[Smoothed] = {
    require(alphaDen >= 2, "alphaDen must be >= 2")
    import points.sparkSession.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(new EwmaProcessor(alphaDen, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class EwmaProcessor(alphaDen: Int,
      stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Point, Smoothed] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("ewma",
        org.apache.spark.sql.Encoders.scalaLong,
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Point],
        timers: TimerValues): Iterator[Smoothed] = {
      val den = alphaDen.toLong
      val sorted = rows.toArray.sortBy(p => (p.ts_us, p.id))
      var has = state.exists()
      var e = if (has) state.get() else 0L
      val out = sorted.map { p =>
        if (!has) { has = true; e = p.xs }
        else e = (p.xs + (den - 1L) * e) / den
        Smoothed(key, p.id, p.xs, e)
      }
      if (has) state.update(e)
      out.iterator
    }
  }
}
