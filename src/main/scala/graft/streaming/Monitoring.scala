package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming health monitoring — the engine's analog of the reference's
  * CloudWatch alarm suite (reference terraform/modules/monitoring/
  * main.tf:45-164: Lambda error/duration alarms, Glue failure alarm,
  * Firehose delivery-success alarm). A [[StreamingQueryListener]]
  * observes every query on the session and raises typed [[Alert]]s for
  * the same three failure classes:
  *
  *  - `error`    — a query terminated with an exception (≈ the
  *                 error-count alarms, threshold 0);
  *  - `slow`     — a micro-batch exceeded `slowBatchMs` (≈ the
  *                 duration alarm, 90 s on a 120 s timeout);
  *  - `stalled`  — a progress report carried zero input rows while
  *                 data was expected (≈ delivery-success = 0).
  *
  * Alerts are collected in-process (the hook a real deployment wires to
  * its pager); progress snapshots are retained for dashboards. All
  * callbacks are on Spark's listener bus thread — collections are
  * thread-safe, and nothing here blocks the bus.
  */
object Monitoring {

  final case class Alert(query: String, kind: String, detail: String)

  final case class ProgressSnapshot(
      query: String, batchId: Long, numInputRows: Long, durationMs: Long)

  final class QueryHealthListener(
      slowBatchMs: Long = 60000L,
      alertOnZeroInput: Boolean = false) extends StreamingQueryListener {

    private val alertsBuf =
      new java.util.concurrent.ConcurrentLinkedQueue[Alert]()
    private val progressBuf =
      new java.util.concurrent.ConcurrentLinkedQueue[ProgressSnapshot]()

    def alerts: Seq[Alert] = {
      import scala.jdk.CollectionConverters._
      alertsBuf.iterator().asScala.toSeq
    }
    def progress: Seq[ProgressSnapshot] = {
      import scala.jdk.CollectionConverters._
      progressBuf.iterator().asScala.toSeq
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val duration = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      progressBuf.add(ProgressSnapshot(
        p.name, p.batchId, p.numInputRows, duration))
      if (duration > slowBatchMs)
        alertsBuf.add(Alert(p.name, "slow",
          s"batch ${p.batchId} took ${duration} ms (limit $slowBatchMs)"))
      if (alertOnZeroInput && p.numInputRows == 0L)
        alertsBuf.add(Alert(p.name, "stalled",
          s"batch ${p.batchId} processed no input rows"))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach { msg =>
        alertsBuf.add(Alert(
          e.id.toString, "error", msg.linesIterator.next()))
      }
  }

  /** Attach a health listener to every streaming query on the session;
    * returns it for alert/progress inspection (and for
    * `removeListener` when done).
    */
  def attach(spark: SparkSession, slowBatchMs: Long = 60000L,
      alertOnZeroInput: Boolean = false): QueryHealthListener = {
    val l = new QueryHealthListener(slowBatchMs, alertOnZeroInput)
    spark.streams.addListener(l)
    l
  }
}
