package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.EventWindows

/**
 * Streaming face of the conversion funnel ([[EventWindows.qFunnel]]):
 * a per-user FSM over event-time-ordered micro-batches via
 * `flatMapGroupsWithState` — the CEP sequence-pattern shape the
 * reference builds as a Flink KeyedProcessFunction with keyed state
 * (SURVEY §2.6 T1–T2); stream ≡ batch is pinned in
 * ReplayEquivalenceSpec. State is three (ts, event_id) pairs per user
 * — O(1) per key, and no timers are needed because every stage
 * predicate only looks backward (a purchase admits itself against the
 * already-seen view/click; nothing waits on future events).
 *
 * At scale this is the standard streaming-funnel layout: state size is
 * |active users| × O(1), each micro-batch shuffles once on user_id,
 * and emission is append-mode (each stage fires exactly once per
 * user), so the sink sees monotone progress rows.
 */
object FunnelTracker {
  case class FunnelEvent(user_id: Long, event_id: Long, ts_s: Long, event_type: String)
  case class FunnelHit(user_id: Long, stage: Long, ts_s: Long)
  case class FunnelState(vT: Long, vId: Long, cT: Long, cId: Long, pT: Long)

  private val Unset = Long.MinValue

  /** (t, id) strictly after (t0, id0) in event-time order — the same
    * tie-break the batch face's windows use. */
  private def later(t: Long, id: Long, t0: Long, id0: Long): Boolean =
    t > t0 || (t == t0 && id > id0)

  val empty: FunnelState = FunnelState(Unset, 0L, Unset, 0L, Unset)

  /** One in-order step of the funnel FSM. */
  def advance(st: FunnelState, e: FunnelEvent): (FunnelState, Option[FunnelHit]) =
    e.event_type match {
      case "view" if st.vT == Unset =>
        (st.copy(vT = e.ts_s, vId = e.event_id),
          Some(FunnelHit(e.user_id, 1L, e.ts_s)))
      case "click" if st.vT != Unset && st.cT == Unset &&
          later(e.ts_s, e.event_id, st.vT, st.vId) =>
        (st.copy(cT = e.ts_s, cId = e.event_id),
          Some(FunnelHit(e.user_id, 2L, e.ts_s)))
      case "purchase" if st.cT != Unset && st.pT == Unset &&
          later(e.ts_s, e.event_id, st.cT, st.cId) &&
          e.ts_s <= st.vT + EventWindows.FunnelWindowSecs =>
        (st.copy(pT = e.ts_s),
          Some(FunnelHit(e.user_id, 3L, e.ts_s)))
      case _ => (st, None)
    }

  def trackStream(ds: Dataset[FunnelEvent]): Dataset[FunnelHit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, events, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(empty)
          val hits = events.toSeq.sortBy(e => (e.ts_s, e.event_id)).flatMap { e =>
            val (next, hit) = advance(st, e)
            st = next
            hit
          }
          state.update(st)
          hits.iterator
      }
  }
}
