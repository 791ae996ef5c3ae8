package graft.stream

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Progress + dead-letter accounting (SURVEY.md §2.4 A1-A4, §2.9 E2).
  *
  * The reference updates a progress ratio after every page/file and
  * accumulates a failure list it reports at the end
  * (watermark_processor.py:161-163, 243-281). The engine's analogues:
  *  - per-epoch progress from `StreamingQueryProgress` (rows, batch time,
  *    state rows) via this listener;
  *  - `Dataset.observe` metrics on the redaction stream (rows seen, rows
  *    actually redacted — the dirty-flag count, :55);
  *  - late-data dead-letter: rows dropped beyond the watermark are counted
  *    (`numRowsDroppedByWatermark`) and reported in the final summary —
  *    continue-and-report, :260-276.
  */
final class RedactionMetricsListener extends StreamingQueryListener {

  final case class EpochProgress(batchId: Long, inputRows: Long,
                                 batchMs: Long, stateRows: Long,
                                 droppedByWatermark: Long,
                                 observedRows: Long, observedRedacted: Long)

  private val epochs = new ConcurrentLinkedQueue[EpochProgress]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val state = p.stateOperators.headOption
    val obs = Option(p.observedMetrics.get("redaction_metrics"))
    epochs.add(EpochProgress(
      p.batchId,
      p.numInputRows,
      p.durationMs.asScala.getOrElse("triggerExecution", java.lang.Long.valueOf(0L)).longValue(),
      state.map(_.numRowsTotal).getOrElse(0L),
      state.map(_.numRowsDroppedByWatermark).getOrElse(0L),
      obs.map(_.getAs[Long]("rows")).getOrElse(0L),
      obs.map(_.getAs[Long]("redacted_rows")).getOrElse(0L)))
  }

  def all: Seq[EpochProgress] = epochs.asScala.toSeq

  /** Final summary aggregate (A4): totals + the continue-and-report split. */
  final case class RunSummary(nEpochs: Long, inputRows: Long, emittedRows: Long,
                              redactedRows: Long, droppedLateRows: Long)

  def summary: RunSummary = {
    val es = all
    RunSummary(es.size.toLong, es.map(_.inputRows).sum, es.map(_.observedRows).sum,
      es.map(_.observedRedacted).sum, es.map(_.droppedByWatermark).sum)
  }
}

object Metrics {
  /** Attach observed metrics to a redaction stream (named
    * `redaction_metrics`; picked up by [[RedactionMetricsListener]]). */
  def observed(red: Dataset[RedactedTurn]): Dataset[RedactedTurn] =
    red.observe("redaction_metrics",
      count(lit(1)).as("rows"),
      coalesce(sum(when(col("was_redacted"), 1L).otherwise(0L)), lit(0L))
        .as("redacted_rows"))
}
