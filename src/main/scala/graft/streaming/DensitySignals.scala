package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{Domain, SecondarySort}
import graft.sources.Tables

/**
 * The CEP layer's P-wave density-drop signal generator, replayed over
 * the `events` table (reference: CEP doc:96-161 — trailing-window
 * baseline mean, warm-up gating, threshold trigger, deterministic
 * signal id; arch doc:574-581 ListState time-series buffer).
 *
 * Semantics per key (user): maintain the trailing 1 h of (ts, value)
 * samples (the ListState analog, T4); for each event, the baseline is
 * the mean of strictly-earlier samples inside the window; a signal
 * fires when the window holds ≥ MinSamples and the current value drops
 * below DropFactor × baseline. The signal id is the deterministic
 * sha256 of (key, side, reason, second) — idempotent across replays
 * (T9/F13).
 *
 * Scale: state per key is bounded by the time window (pruned on every
 * event), the stream shuffles once on the key, and the batch face is
 * the same pure fold — one shuffle, sorted within key, no global sort.
 */
object DensitySignals {

  val WindowMs = 3600000L
  val MinSamples = 10
  val DropFactor = 0.5
  val Side = "SELL"
  val Reason = "DENSITY_DROP"

  /** One emitted signal row. */
  final case class Signal(
      user_id: Long, event_id: Long, ts_ms: Long, value: Double,
      baseline: Double, n: Long, signal_id: String)

  /** Trailing-window sample buffer carried across micro-batches. */
  final case class DensityState(samples: Seq[(Long, Double)])

  /** Streaming input record (named fields so the watermark column can
    * ride alongside without breaking the deserializer). */
  final case class DsEvent(user_id: Long, ts_ms: Long, event_id: Long, value: Double)

  /** Pure per-event step: (buffer, event) → (buffer', signal?). The
    * buffer holds the trailing window including same-ts peers; the
    * baseline uses strictly-earlier samples only (matches the oracle's
    * RANGE … 1 PRECEDING frame). Decimal-exact summation (valueOf:
    * shortest decimal repr of the double, identical to DuckDB's
    * DECIMAL(18,6) cast for ≤6-dp inputs). */
  def step(buffer: Vector[(Long, Double)], userId: Long, tsMs: Long, eventId: Long,
           value: Double): (Vector[(Long, Double)], Option[Signal]) = {
    val pruned = buffer.dropWhile(_._1 < tsMs - WindowMs)
    val window = pruned.filter(_._1 < tsMs)
    val n = window.size
    val out =
      if (n >= MinSamples) {
        val sum = window.foldLeft(java.math.BigDecimal.ZERO) { (acc, s) =>
          acc.add(java.math.BigDecimal.valueOf(s._2))
        }
        val baseline = sum.doubleValue / n
        if (baseline > 0 && value < DropFactor * baseline)
          Some(Signal(userId, eventId, tsMs, value, baseline, n.toLong,
            Domain.deterministicSignalId(userId.toString, Side, Reason, tsMs)))
        else None
      } else None
    (pruned :+ ((tsMs, value)), out)
  }

  /** Replay one key's time-sorted events through the buffer FSM. */
  def runKey(userId: Long, sorted: Iterator[(Long, Long, Double)],
             initial: Vector[(Long, Double)] = Vector.empty): (Vector[(Long, Double)], Seq[Signal]) = {
    var buf = initial
    val out = Seq.newBuilder[Signal]
    sorted.foreach { case (tsMs, eventId, value) =>
      val (b2, sig) = step(buf, userId, tsMs, eventId, value)
      buf = b2
      sig.foreach(out += _)
    }
    (buf, out.result())
  }

  /** Batch face over the events table (oracle-checked). Spillable
    * secondary sort + iterator FSM: the trailing-window buffer is the
    * only per-key memory; a hot user's history never materializes. */
  def qDensitySignals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)]
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_ms", $"event_id")
      .mapPartitions { it =>
        SecondarySort.runs(it)(_._1).flatMap { case (user, events) =>
          var buf = Vector.empty[(Long, Double)]
          events.flatMap { case (_, ts, eid, value) =>
            val (b2, sig) = step(buf, user, ts, eid, value)
            buf = b2
            sig
          }
        }
      }
      .toDF()
      .orderBy($"user_id", $"event_id")
  }

  /** Closed-form oracle: the FSM's window is exactly the RANGE frame
    * [ts−3600000, ts−1] over epoch-ms (exclusive of the current event
    * and its same-ms peers), with the same decimal-exact mean. */
  val sqlDensitySignals: String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_w,
       |    count(*) OVER w AS n
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
       |               RANGE BETWEEN $WindowMs PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id, ts_ms, value,
       |  sum_w / n AS baseline, n,
       |  sha256(user_id || '|$Side|$Reason|' || (ts_ms // 1000)) AS signal_id
       |FROM x
       |WHERE n >= $MinSamples AND sum_w / n > 0 AND value < $DropFactor * (sum_w / n)
       |ORDER BY user_id, event_id""".stripMargin

  /** Streaming face: the same FSM with the buffer in the state store,
    * carried across micro-batches; stale keys expire one window after
    * their last event via event-time timeout. */
  def detectStream(events: Dataset[DsEvent]): Dataset[Signal] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", "0 seconds")
      .as[DsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DensityState, Signal](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[DsEvent], state: GroupState[DensityState]) =>
          if (it.isEmpty) {
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.map(_.samples.toVector).getOrElse(Vector.empty)
            val sorted = it.toVector.sortBy(e => (e.ts_ms, e.event_id))
            val (buf, signals) =
              runKey(user, sorted.iterator.map(e => (e.ts_ms, e.event_id, e.value)), prior)
            state.update(DensityState(buf))
            if (buf.nonEmpty) state.setTimeoutTimestamp(
              math.max(buf.last._1 + WindowMs, state.getCurrentWatermarkMs() + 1))
            signals.iterator
          }
      }
  }
}
