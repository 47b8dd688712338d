package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming face of the exp4 Wald SPRT — the form the sequential test
  * was INVENTED for: observations arrive one at a time and the test
  * decides the moment the evidence crosses a boundary, instead of
  * replaying a finished log. Per-arm state is three longs and a flag
  * (`ValueState` via `transformWithState`): the running LLR in the same
  * ×10⁹ integer units as the batch operator, and the frozen decision
  * once a boundary is crossed.
  *
  * The LLR increments and both boundaries come from
  * [[graft.operators.Experiment.sprtConstants]] — ONE quantization
  * shared by the batch operator, its DuckDB oracle, and this stream, so
  * all three walk the identical integer sequence.
  *
  * PARITY CONTRACT (spec-pinned, the StreamingCusum/StreamingEwma
  * contract): with micro-batches arriving in event-time order, the
  * first boundary crossing — (at_order, llr_x1e9, decision) — matches
  * [[graft.operators.Experiment.sprt]] exactly under ANY batch split,
  * and every pre-crossing row's running LLR matches the batch prefix
  * sum (rows are processed in `ord` order within each batch; every
  * step is integer, so there is nothing float to drift). The order
  * side of the contract is ENFORCED, not assumed: the max processed
  * `ord` rides in state and a duplicate or late `ord` fails the query
  * fast — mirroring the batch face's duplicate-order fail-fast —
  * instead of silently walking the LLR in the wrong position.
  *
  * FREEZE SEMANTICS: Wald's test STOPS at the first crossing — further
  * observations must not move a decision that may already have acted.
  * Rows arriving after the crossing emit the FROZEN (at_order,
  * llr_x1e9, decision) tuple (the serving answer to "what is this
  * arm's test status?"), not a continued walk. The batch face keeps
  * the full walk; the streaming face keeps the contract a sequential
  * test actually promises.
  */
object StreamingSprt {

  case class Obs(arm: Long, ord: Long, success: Boolean)

  /** Per-observation test status: the running LLR until a boundary is
    * crossed, then the frozen crossing tuple. `decision` is `continue`,
    * `accept_h1`, or `accept_h0`; `at_order` is the crossing `ord` (the
    * row's own `ord` while undecided).
    */
  case class Status(arm: Long, ord: Long, at_order: Long, llr_x1e9: Long,
      decision: String)

  def sprtStream(obs: Dataset[Obs], p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05,
      stateTtl: Option[java.time.Duration] = None): Dataset[Status] = {
    import obs.sparkSession.implicits._
    val (wSucc, wFail, up, lo) =
      graft.operators.Experiment.sprtConstants(p0, p1, alpha, beta)
    obs.groupByKey(_.arm)
      .transformWithState(new SprtProcessor(wSucc, wFail, up, lo, stateTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class SprtProcessor(wSucc: Long, wFail: Long, up: Long, lo: Long,
      stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Obs, Status] {
    // (running llr, decided 0/1/2 = continue/h1/h0, crossing ord,
    //  max ord processed — the order-contract enforcer below).
    // STATE-SCHEMA NOTE (round-15 advisory): this tuple widened from
    // (Long, Long, Long) in round 15 — a streaming query restarted from
    // a checkpoint written by the 3-field version fails to decode its
    // state (loudly, at restart). Restart such a query from a FRESH
    // checkpoint dir; any future widening should version the state name
    // ("sprt2") instead.
    @transient private var state: ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Long, Long)]("sprt",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timers: TimerValues): Iterator[Status] = {
      val sorted = rows.toArray.sortBy(_.ord)
      var (llr, decided, atOrd, maxOrd) =
        if (state.exists()) state.get() else (0L, 0L, 0L, Long.MinValue)
      val out = sorted.map { o =>
        // ENFORCED, not just documented: a duplicate or late ord would
        // walk the LLR in the wrong position and silently move/freeze a
        // decision — the exact hazard the batch face fail-fasts via
        // globalRunningSum's duplicate-order check. The max processed
        // ord rides in state so the check spans micro-batches.
        require(o.ord > maxOrd,
          s"sprtStream: ord ${o.ord} for arm $key arrived at or before " +
            s"the max ord already processed ($maxOrd) — duplicate or " +
            "out-of-order observation; the LLR walk position would be " +
            "wrong. Deliver micro-batches in event order (the parity " +
            "contract), as the batch face enforces via its " +
            "duplicate-order fail-fast")
        maxOrd = o.ord
        if (decided == 0L) {
          llr += (if (o.success) wSucc else wFail)
          if (llr >= up) { decided = 1L; atOrd = o.ord }
          else if (llr <= lo) { decided = 2L; atOrd = o.ord }
        }
        Status(key, o.ord, if (decided == 0L) o.ord else atOrd, llr,
          decided match {
            case 0L => "continue"
            case 1L => "accept_h1"
            case _ => "accept_h0"
          })
      }
      if (sorted.nonEmpty) state.update((llr, decided, atOrd, maxOrd))
      out.iterator
    }
  }
}
