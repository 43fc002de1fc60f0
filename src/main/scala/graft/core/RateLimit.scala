package graft.core

import scala.collection.mutable

/**
 * Execution-layer rate limiting (reference: arch doc:1475-1729 —
 * TokenBucket(rate=7, capacity=7) against Upbit's 8 req/s budget,
 * SELL-over-BUY priority, 200 ms TTL on BUY signals; SURVEY §2.6 T15).
 * Pure Scala, driver-side: this is an ops component of the execution
 * service, not a distributed query operator.
 */
object RateLimit {

  /** Token bucket: `rate` tokens/s refill up to `capacity`. Time is
    * passed in (ms) so behavior is deterministic and testable. */
  final class TokenBucket(val rate: Double, val capacity: Double, startMs: Long) {
    private var tokens: Double = capacity
    private var lastMs: Long = startMs

    def available(nowMs: Long): Double =
      math.min(capacity, tokens + (nowMs - lastMs) / 1000.0 * rate)

    def tryAcquire(nowMs: Long, n: Double = 1.0): Boolean = {
      tokens = available(nowMs)
      lastMs = nowMs
      if (tokens >= n) { tokens -= n; true } else false
    }
  }

  sealed trait Side { def priority: Int }
  case object Sell extends Side { val priority = 0 } // SELL first: exits protect capital
  case object Buy extends Side { val priority = 1 }

  final case class Order(side: Side, signalId: String, issuedAtMs: Long)

  val BuyTtlMs = 200L // stale BUY signals are discarded, never queued late

  /** Priority queue with SELL > BUY and TTL-on-dequeue for BUYs
    * (reference: arch doc:1581-1597 — a BUY older than 200 ms is a
    * missed opportunity and must not consume rate budget). */
  final class PriorityTtlQueue {
    private val q = mutable.PriorityQueue.empty[(Int, Long, Order)](
      Ordering.by[(Int, Long, Order), (Int, Long)](e => (e._1, e._2)).reverse)

    def enqueue(o: Order): Unit = q.enqueue((o.side.priority, o.issuedAtMs, o))

    /** Next live order at `nowMs`; expired BUYs are dropped and
      * reported in `expired`. */
    def dequeue(nowMs: Long): (Option[Order], Seq[Order]) = {
      val expired = Seq.newBuilder[Order]
      while (q.nonEmpty) {
        val (_, _, o) = q.dequeue()
        if (o.side == Buy && nowMs - o.issuedAtMs > BuyTtlMs) expired += o
        else return (Some(o), expired.result())
      }
      (None, expired.result())
    }

    def size: Int = q.size
  }
}
