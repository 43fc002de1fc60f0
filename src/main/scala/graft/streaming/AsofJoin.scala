package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the as-of join ([[graft.operators.Temporal.qAsofJoin]]):
 * a stream-stream point-in-time enrichment. The two sides arrive as one
 * tagged stream (side 0 = state carrier, side 1 = probe — the same
 * tagged-union encoding as the batch face); per key the state holds
 * only the latest carrier row, and each probe emits enriched with it.
 *
 * State is O(1) per key — a single (ts, value) pair — so at cluster
 * scale the state store stays tiny no matter how deep the history
 * (contrast with a windowed stream-stream join, which buffers both
 * sides). Same-timestamp ordering matches the batch face: carriers
 * sort before probes (at-or-before semantics), and same-ts carriers
 * reduce by max value.
 *
 * Reference analogue: matching trade feedback to the most recent
 * signal per market (the stale-feedback guard's lookup shape,
 * 추후 과제.md:59-219).
 */
object AsofJoin {

  /** One tagged input row: side 0 = carrier (click), 1 = probe (purchase). */
  final case class Tick(user_id: Long, ts_ms: Long, side: Int, event_id: Long, value: Double)

  /** Latest carrier per key. */
  final case class LastCarrier(c_ts: Long, c_val: Double)

  final case class Enriched(user_id: Long, ts_ms: Long, event_id: Long, value: Double,
                            click_ts_ms: Option[Long], click_value: Option[Double])

  def enrichStream(ticks: Dataset[Tick]): Dataset[Enriched] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastCarrier, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Tick], state: GroupState[LastCarrier]) =>
          // Micro-batch fold in (ts, side, event_id) order — carriers
          // first at equal ts, mirroring the batch face's window sort.
          val sorted = it.toVector.sortBy(t => (t.ts_ms, t.side, t.event_id))
          var last = state.getOption
          val out = Vector.newBuilder[Enriched]
          sorted.foreach { t =>
            if (t.side == 0) {
              last = last match {
                // same-ts carriers reduce by max value (batch: max(value)
                // per (user, ts)); a newer ts always replaces.
                case Some(c) if c.c_ts == t.ts_ms => Some(LastCarrier(t.ts_ms, math.max(c.c_val, t.value)))
                case Some(c) if c.c_ts > t.ts_ms  => Some(c) // late carrier: keep newest
                case _                            => Some(LastCarrier(t.ts_ms, t.value))
              }
            } else {
              out += Enriched(uid, t.ts_ms, t.event_id, t.value,
                last.map(_.c_ts), last.map(_.c_val))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
