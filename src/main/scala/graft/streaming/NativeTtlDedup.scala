package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.IdempotentDedup.SignalRow

/**
 * Spark-4-native variant of [[IdempotentDedup]]: `transformWithState`
 * with a per-key `ValueState` carrying a real `TTLConfig` — the
 * platform expires the recently-seen entry itself instead of our
 * event-time bookkeeping. Requires the RocksDB state store provider
 * (`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`),
 * which is also why this stays behind a flag here:
 *
 * ENVIRONMENT NOTE (retried rounds 5-8, last 2026-08-14): under this sandbox's
 * local[32] JVM the RocksDB provider's maintenance thread stalls the
 * first micro-batch indefinitely (no error surfaces; the query never
 * finishes `processAllAvailable`). NativeTtlDedupSpec therefore only
 * runs when `GRAFT_NATIVE_TTL=1` is exported — re-run it each round;
 * if the runtime gains a working RocksDB provider the spec goes green
 * and T5 can migrate here.
 *
 * SEMANTICS NOTE: `TTLConfig` expiry is PROCESSING-time — a replay of
 * the same rows at different wall-clock speed can re-admit
 * differently. The event-time encoding in [[IdempotentDedup]] replays
 * bit-deterministically (same rows ⇒ same output, any batching — see
 * its property spec), so it stays the canonical path even where the
 * native provider works; this variant exists for pipelines that WANT
 * wall-clock expiry (e.g. the reference's 30 s recently-seen cache,
 * CEP doc:185-192).
 */
object NativeTtlDedup {

  /** Emits only the first row per signal id while the id's state entry
    * is alive; the entry self-expires after `ttl` of wall-clock time,
    * re-admitting the id. */
  final class FirstSeenProcessor(ttlMs: Long)
      extends StatefulProcessor[String, SignalRow, SignalRow] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: String, rows: Iterator[SignalRow],
                                 timers: TimerValues): Iterator[SignalRow] = {
      // deterministic within a batch: first row by event time
      val sorted = rows.toVector.sortBy(r => (r.ts_ms, r.value))
      if (sorted.isEmpty || seen.exists()) Iterator.empty
      else {
        seen.update(sorted.head.ts_ms)
        Iterator.single(sorted.head)
      }
    }
  }

  def dedupStream(rows: Dataset[SignalRow],
                  ttlMs: Long = IdempotentDedup.TtlMs): Dataset[SignalRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.signal_id)
      .transformWithState(new FirstSeenProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
