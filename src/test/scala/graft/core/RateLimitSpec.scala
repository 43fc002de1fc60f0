package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.RateLimit._

class RateLimitSpec extends AnyFunSuite {

  test("token bucket: burst up to capacity, then rate-bound refill") {
    val b = new TokenBucket(rate = 7.0, capacity = 7.0, startMs = 0L)
    assert((1 to 7).forall(_ => b.tryAcquire(0L)))   // full burst
    assert(!b.tryAcquire(0L))                        // empty
    assert(!b.tryAcquire(100L))                      // 0.7 tokens — not enough
    assert(b.tryAcquire(150L))                       // 1.05 tokens
    assert(!b.tryAcquire(151L))                      // spent again
  }

  test("token bucket: never exceeds capacity after long idle") {
    val b = new TokenBucket(7.0, 7.0, 0L)
    (1 to 7).foreach(_ => b.tryAcquire(0L))
    assert(b.available(3600000L) == 7.0) // one hour idle: capped at 7
  }

  test("queue: SELL dequeues before earlier BUY") {
    val q = new PriorityTtlQueue
    q.enqueue(Order(Buy, "b1", 0L))
    q.enqueue(Order(Sell, "s1", 50L))
    val (first, _) = q.dequeue(60L)
    assert(first.map(_.signalId).contains("s1"))
    val (second, _) = q.dequeue(60L)
    assert(second.map(_.signalId).contains("b1"))
  }

  test("queue: expired BUYs are discarded on dequeue, SELLs never expire") {
    val q = new PriorityTtlQueue
    q.enqueue(Order(Buy, "b-old", 0L))
    q.enqueue(Order(Buy, "b-fresh", 900L))
    q.enqueue(Order(Sell, "s-old", 0L))
    val (first, exp1) = q.dequeue(1000L)
    assert(first.map(_.signalId).contains("s-old")) // SELL survives 1s queue delay
    assert(exp1.isEmpty)
    val (second, exp2) = q.dequeue(1000L)
    assert(second.map(_.signalId).contains("b-fresh")) // 100ms old: alive
    assert(exp2.map(_.signalId) == Seq("b-old"))       // >200ms: dropped
  }

  test("queue: same priority dequeues in issue order") {
    val q = new PriorityTtlQueue
    q.enqueue(Order(Sell, "s2", 20L))
    q.enqueue(Order(Sell, "s1", 10L))
    assert(q.dequeue(30L)._1.map(_.signalId).contains("s1"))
    assert(q.dequeue(30L)._1.map(_.signalId).contains("s2"))
  }
}
