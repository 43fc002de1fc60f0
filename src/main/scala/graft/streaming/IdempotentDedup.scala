package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Exactly-once signal ingestion: per-signal-id first-seen state with a
 * TTL window — the streaming encoding of the reference's idempotence
 * strategy (deterministic signal id + UNIQUE constraint,
 * arch doc:1158-1364) and its 30 s recently-seen TTL cache
 * (CEP doc:185-192; SURVEY §2.6 T5, §2.7 D1). Built-in
 * `dropDuplicatesWithinWatermark` covers the common case; this
 * operator additionally re-admits an id after the TTL lapses (the
 * UNIQUE-within-window semantic) and emits deterministically (first
 * row by event time, not arrival order).
 *
 * Note: Spark 4's `transformWithState` offers native per-state TTL
 * (`TTLConfig` + RocksDB provider) and would be the idiomatic home for
 * this at cluster scale; in this environment that provider stalls, so
 * the TTL is event-time bookkeeping inside `flatMapGroupsWithState`
 * with identical semantics — and event-time TTL replays
 * deterministically, which processing-time TTL does not.
 */
object IdempotentDedup {

  final case class SignalRow(signal_id: String, code: String, ts_ms: Long, value: Double)

  /** first-seen event time per id (cleared by timeout after the TTL). */
  final case class SeenState(firstSeenMs: Long)

  val TtlMs = 30000L

  /** Emits only the first row (by event time) per signal id; duplicates
    * within `ttlMs` are dropped; after expiry the id is re-admitted. */
  def dedupStream(rows: Dataset[SignalRow], ttlMs: Long = TtlMs): Dataset[SignalRow] = {
    import rows.sparkSession.implicits._
    rows
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", "0 seconds")
      .as[SignalRow]
      .groupByKey(_.signal_id)
      .flatMapGroupsWithState[SeenState, SignalRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[SignalRow], state: GroupState[SeenState]) =>
          if (it.isEmpty) {
            if (state.hasTimedOut) state.remove() // TTL lapsed: id re-admissible
            Iterator.empty
          } else {
            val sorted = it.toVector.sortBy(r => (r.ts_ms, r.value))
            val out = state.getOption match {
              case Some(s) =>
                // live entry: drop all, but extend nothing (OnCreate semantics)
                sorted.filter(r => r.ts_ms - s.firstSeenMs >= ttlMs) match {
                  case later if later.nonEmpty => // first dup past the TTL re-admits
                    state.update(SeenState(later.head.ts_ms))
                    Vector(later.head)
                  case _ => Vector.empty
                }
              case None =>
                state.update(SeenState(sorted.head.ts_ms))
                Vector(sorted.head)
            }
            state.getOption.foreach { s =>
              state.setTimeoutTimestamp(
                math.max(s.firstSeenMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
