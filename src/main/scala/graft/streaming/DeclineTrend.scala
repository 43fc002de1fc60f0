package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the decline-trend composite (reference: arch
 * doc:642-647 — previous window's mean in ValueState, trigger on "2회
 * 연속 감소" / two consecutive drops; batch face
 * operators.EventWindows.qDeclineTrend). Consumes per-(key, window)
 * totals — the output of any windowed aggregation — and keeps exactly
 * the reference's state: the previous window's value plus whether it
 * had itself declined.
 *
 * Scale: state per key is two scalars (no buffer); one shuffle on the
 * key. The upstream windowed agg and this FSM chain as two stateful
 * operators, the same topology the reference runs (window → keyed
 * process).
 */
object DeclineTrend {

  /** One upstream windowed-aggregation row. */
  final case class WindowTotal(key: String, window_start_s: Long, total: Double)

  /** ValueState analog: previous window's total + its decline flag. */
  final case class TrendState(prevTotal: Double, prevDeclined: Boolean)

  /** Emitted when the current window is the second consecutive drop. */
  final case class Trigger(
      day_s: Long, event_type: String, day_total: Double,
      prev_total: Double, declines_in_row: Long)

  /** Pure per-window step: (state, window) → (state', trigger?). */
  def step(state: Option[TrendState], key: String, windowStartS: Long,
           total: Double): (TrendState, Option[Trigger]) = {
    val declined = state.exists(s => total < s.prevTotal)
    val fire = declined && state.exists(_.prevDeclined)
    val out =
      if (fire) Some(Trigger(windowStartS, key, total, state.get.prevTotal, 2L))
      else None
    (TrendState(total, declined), out)
  }

  /** Replay one key's time-sorted window totals. */
  def runKey(key: String, sorted: Iterator[(Long, Double)],
             initial: Option[TrendState] = None): (Option[TrendState], Seq[Trigger]) = {
    var s = initial
    val out = Seq.newBuilder[Trigger]
    sorted.foreach { case (ws, total) =>
      val (s2, trig) = step(s, key, ws, total)
      s = Some(s2)
      trig.foreach(out += _)
    }
    (s, out.result())
  }

  /** Streaming face: totals arrive per micro-batch (in window order
    * within a key, guaranteed by the upstream watermark), state carries
    * across batches. */
  def trendStream(totals: Dataset[WindowTotal]): Dataset[Trigger] = {
    import totals.sparkSession.implicits._
    totals
      .withColumn("eventTime", timestamp_seconds(col("window_start_s")))
      .withWatermark("eventTime", "0 seconds")
      .as[WindowTotal]
      .groupByKey(_.key)
      .flatMapGroupsWithState[TrendState, Trigger](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[WindowTotal], state: GroupState[TrendState]) =>
          if (it.isEmpty) Iterator.empty
          else {
            val sorted = it.toVector.sortBy(_.window_start_s)
            val (s, trigs) = runKey(key,
              sorted.iterator.map(w => (w.window_start_s, w.total)), state.getOption)
            s.foreach(state.update)
            trigs.iterator
          }
      }
  }
}
