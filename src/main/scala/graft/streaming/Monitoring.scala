package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/**
 * Ops metrics (reference: Prometheus counters/gauges/histograms in
 * kafka_producer.py:24-63 and the ingest loop's processed/failed
 * counters, ingestion_service.py:184-203; SURVEY §2.4 A7–A8).
 *
 * Spark-native encoding: a StreamingQueryListener accumulating
 * per-query totals from the engine's own progress events — rows in,
 * rows/sec, batch count, state rows — instead of hand-maintained
 * counters threaded through operator code.
 */
final class QueryMetricsListener extends StreamingQueryListener {

  final case class QueryTotals(
      batches: Long, inputRows: Long, stateRows: Long, lastInputRowsPerSec: Double)

  private val totals = new ConcurrentHashMap[String, QueryTotals]()

  def metricsFor(queryName: String): Option[QueryTotals] =
    Option(totals.get(queryName))

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    totals.compute(name, (_, prev) => {
      val base = Option(prev).getOrElse(QueryTotals(0L, 0L, 0L, 0.0))
      QueryTotals(
        base.batches + 1,
        base.inputRows + p.numInputRows,
        stateRows,
        p.inputRowsPerSecond)
    })
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
}
