package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of the an4 CUSUM changepoint statistic: the batch
  * query's prefix-sum-minus-prefix-min windows become two longs of
  * per-key `ValueState` (running sum r, running min of r) carried across
  * micro-batches via `transformWithState` — the monitoring shape
  * (drift alarms on live event streams) of the same exact integer
  * arithmetic.
  *
  * PARITY CONTRACT (spec-pinned, same contract as [[StreamingEwma]]):
  * with micro-batches arriving in event-time order, per-row
  * cusum = r_t − min(0, min_{j≤t} r_j) matches the batch windows
  * row for row — the statistic depends only on the ordered prefix, rows
  * are processed in (ts, id) order within each batch, and every step is
  * integer (centi-units), so there is nothing float to drift. The
  * reference level `k` is a PARAMETER here (a broadcast-scalar corpus
  * mean in the batch query): a stream cannot know its corpus mean, so
  * the caller pins the level (e.g. from the training window) — the
  * standard CUSUM deployment split.
  */
object StreamingCusum {

  case class Point(key: Long, ts_us: Long, id: Long, vs: Long)
  case class Cusum(key: Long, id: Long, vs: Long, cusum: Long)

  def cusumStream(points: Dataset[Point], k: Long,
      stateTtl: Option[java.time.Duration] = None): Dataset[Cusum] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(new CusumProcessor(k, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class CusumProcessor(k: Long, stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Point, Cusum] {
    // (running sum r, running min of r over the full prefix)
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("cusum",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Point],
        timers: TimerValues): Iterator[Cusum] = {
      val sorted = rows.toArray.sortBy(p => (p.ts_us, p.id))
      var (r, minR) =
        if (state.exists()) state.get() else (0L, Long.MaxValue)
      val out = sorted.map { p =>
        r += p.vs - k
        if (r < minR) minR = r
        Cusum(key, p.id, p.vs, r - math.min(minR, 0L))
      }
      if (sorted.nonEmpty) state.update((r, minR))
      out.iterator
    }
  }
}
