package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Spoofing detection (reference: arch doc:583-592, 기획 doc:104-109;
 * SURVEY §2.6 T7): a newly-appeared large ask level (> threshold share
 * of total book depth) arms a per-price timer TimerMs ahead; when the
 * timer fires and the level has vanished, the order was a spoof —
 * placed to fake depth and pulled before execution.
 *
 * Spark encoding per SURVEY: per-price deadlines live in a MapState
 * analog inside `flatMapGroupsWithState` keyed by market code; timers
 * are evaluated in event time against each incoming book, so batch
 * replay and live streams produce identical alerts.
 */
object SpoofingDetector {

  val TimerMs = 1500L
  val ThresholdPct = 0.05 // > 5% of total book depth arms the timer

  final case class Book(code: String, ts_ms: Long, prices: Seq[Double], sizes: Seq[Double])

  /** `armed`: price -> (registered size, deadline). `verified`: large
    * levels that survived their timer — genuine resting orders, not
    * re-armed while they stay on the book (else a legit fill would
    * alert later). */
  final case class SpoofState(armed: Map[Double, (Double, Long)], verified: Set[Double])
  val Empty: SpoofState = SpoofState(Map.empty, Set.empty)

  final case class SpoofAlert(
      code: String, price: Double, registered_size: Double,
      armed_at_ms: Long, fired_at_ms: Long)

  /** Pure step: evaluate due timers against the current book, then arm
    * timers for new large levels. */
  def step(s: SpoofState, b: Book): (SpoofState, Seq[SpoofAlert]) = {
    val present = b.prices.toSet
    val alerts = Vector.newBuilder[SpoofAlert]
    var armed = s.armed
    var verified = s.verified.intersect(present) // departed legit levels forget
    // 1. due timers: vanished level => spoofing alert; survivor => verified
    s.armed.foreach { case (price, (size, deadline)) =>
      if (b.ts_ms >= deadline) {
        if (!present.contains(price))
          alerts += SpoofAlert(b.code, price, size, deadline - TimerMs, b.ts_ms)
        else verified += price
        armed -= price
      }
    }
    // 2. arm new large levels (first sighting only — re-arming on every
    //    book would let a spoofer reset its own timer)
    val total = b.sizes.sum
    if (total > 0) {
      b.prices.indices.foreach { i =>
        val (price, size) = (b.prices(i), b.sizes(i))
        if (size > ThresholdPct * total && !armed.contains(price) && !verified.contains(price))
          armed += price -> ((size, b.ts_ms + TimerMs))
      }
    }
    (SpoofState(armed, verified), alerts.result())
  }

  def runKey(sorted: Iterator[Book], initial: SpoofState = Empty): (SpoofState, Seq[SpoofAlert]) = {
    var s = initial
    val out = Seq.newBuilder[SpoofAlert]
    sorted.foreach { b =>
      val (s2, a) = step(s, b)
      s = s2
      out ++= a
    }
    (s, out.result())
  }

  /** Batch replay over a book Dataset. */
  def detectBatch(books: Dataset[Book]): Dataset[SpoofAlert] = {
    import books.sparkSession.implicits._
    books.groupByKey(_.code)
      .flatMapGroups { (_: String, it: Iterator[Book]) =>
        runKey(it.toVector.sortBy(_.ts_ms).iterator)._2
      }
  }

  /** Streaming face, state carried across micro-batches. */
  def detectStream(books: Dataset[Book]): Dataset[SpoofAlert] = {
    import books.sparkSession.implicits._
    books
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", "0 seconds")
      .as[Book]
      .groupByKey(_.code)
      .flatMapGroupsWithState[SpoofState, SpoofAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Book], state: GroupState[SpoofState]) =>
          if (it.isEmpty) Iterator.empty
          else {
            val (s, alerts) = runKey(it.toVector.sortBy(_.ts_ms).iterator,
              state.getOption.getOrElse(Empty))
            if (s.armed.isEmpty && s.verified.isEmpty) state.remove()
            else state.update(s)
            alerts.iterator
          }
      }
  }
}
