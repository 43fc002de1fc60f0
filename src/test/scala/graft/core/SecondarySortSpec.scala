package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Model.Transaction
import graft.streaming.FraudDetection

/** Pins the spillable secondary-sort contract: per-key runs are lazy
  * (no materialization) and a pathologically hot key streams through
  * the batch FSM faces. */
class SecondarySortRunsSpec extends AnyFunSuite {

  test("runs groups consecutive same-key elements in order") {
    val it = Iterator(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5))
    val got = SecondarySort.runs(it)(_._1).map { case (k, r) => k -> r.map(_._2).toList }.toList
    assert(got == List("a" -> List(1, 2), "b" -> List(3), "c" -> List(4, 5)))
  }

  test("advancing past a partially-consumed run drains it safely") {
    val it = Iterator(("a", 1), ("a", 2), ("a", 3), ("b", 4))
    val outer = SecondarySort.runs(it)(_._1)
    val (_, runA) = outer.next()
    assert(runA.next()._2 == 1) // leave 2, 3 unconsumed
    val (k, runB) = outer.next()
    assert(k == "b" && runB.map(_._2).toList == List(4))
  }

  test("runs is lazy: an FSM over an endless key emits without materializing") {
    // endless single-key stream; if runs (or the FSM driver pattern)
    // buffered the key's history, take(3) would never return
    val endless = Iterator.from(0).map(i => ("hot", i.toLong))
    val out = SecondarySort.runs(endless)(_._1).flatMap { case (_, events) =>
      var seen = 0L
      events.flatMap { case (_, i) =>
        seen += 1
        if (i % 1000 == 0) Some(i -> seen) else None
      }
    }
    assert(out.take(3).toList == List(0L -> 1L, 1000L -> 1001L, 2000L -> 2001L))
  }
}

/** End-to-end hot-key stress: one account owning 1M events flows
  * through the rewritten batch face (iterator FSM, no per-key Vector). */
class HotKeySpec extends SparkSpec {

  test("detectBatch streams 1M events on a single hot key") {
    import spark.implicits._
    val n = 1000000
    // alternating small/large on ONE account: every (small, large) pair
    // inside the 60 s window fires exactly one alert
    val txns = spark.range(n).map { i =>
      Transaction(42L, i * 1000L, if (i % 2 == 0) 0.5 else 600.0)
    }
    val alerts = FraudDetection.detectBatch(txns)
    assert(alerts.count() == n / 2)
  }
}
