package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Domain._

class DomainSpec extends AnyFunSuite {

  // --- densityChangeRate (reference: CEP doc:111-149) ----------------

  private def samples(n: Int, vol: Double, startMs: Long = 0L): Seq[(Long, BigDecimal)] =
    (0 until n).map(i => (startMs + i * 1000L, BigDecimal(vol)))

  test("density: warm-up when fewer than minSamples") {
    assert(densityChangeRate(BigDecimal(50), samples(9, 100.0), 60000L, 0L) == WarmingUp)
  }

  test("density: warm-up when history shorter than warmupSeconds") {
    assert(densityChangeRate(BigDecimal(50), samples(20, 100.0), 29999L, 0L) == WarmingUp)
  }

  test("density: warm-up when baseline is zero") {
    assert(densityChangeRate(BigDecimal(50), samples(20, 0.0), 60000L, 0L) == WarmingUp)
  }

  test("density: 30% drop vs flat baseline, quantized 4dp HALF_UP") {
    densityChangeRate(BigDecimal(70), samples(20, 100.0), 60000L, 0L) match {
      case DensityChange(rate) => assert(rate == BigDecimal("30.0000"))
      case other => fail(s"expected DensityChange, got $other")
    }
  }

  test("density: growth yields negative rate") {
    densityChangeRate(BigDecimal(150), samples(20, 100.0), 60000L, 0L) match {
      case DensityChange(rate) => assert(rate == BigDecimal("-50.0000"))
      case other => fail(s"expected DensityChange, got $other")
    }
  }

  // --- deterministic signal id (reference: CEP doc:153-161) ----------

  test("signal id: deterministic, second-truncated, 64 hex chars") {
    val a = deterministicSignalId("KRW-BTC", "BUY", "PWAVE", 1700000000123L)
    val b = deterministicSignalId("KRW-BTC", "BUY", "PWAVE", 1700000000999L)
    val c = deterministicSignalId("KRW-BTC", "BUY", "PWAVE", 1700000001000L)
    assert(a == b)      // same second => same id (idempotent replay)
    assert(a != c)      // next second => new id
    assert(a.matches("[0-9a-f]{64}"))
  }

  // --- connection FSM (reference: connection_state.py:25-127) --------

  test("FSM: the legal transition matrix, exhaustively") {
    val legal = Set[(ConnState, ConnState)](
      (Disconnected, Connecting),
      (Connecting, Connected), (Connecting, Failed),
      (Connected, Disconnected), (Connected, Reconnecting), (Connected, Failed),
      (Reconnecting, Connected), (Reconnecting, Failed), (Reconnecting, Disconnected),
      (Failed, Disconnected))
    for (from <- AllConnStates; to <- AllConnStates) {
      val expected = from == to || legal((from, to))
      assert(canTransition(from, to) == expected, s"${from.name} -> ${to.name}")
      assert(transition(from, to).isRight == expected)
    }
  }

  // --- backoff (reference: base_websocket.py:364-383) ----------------

  test("backoff: exponential then capped") {
    assert(backoffSeconds(0) == 1.0)
    assert(backoffSeconds(1) == 2.0)
    assert(backoffSeconds(5) == 32.0)
    assert(backoffSeconds(6) == 60.0)
    assert(backoffSeconds(100) == 60.0)
  }

  // --- validation (reference: market_data.py:147-239) ----------------

  test("market code validation: trims, upper-cases, requires KRW- prefix") {
    assert(validateMarketCode(" krw-btc ") == Right("KRW-BTC"))
    assert(validateMarketCode("").isLeft)
    assert(validateMarketCode(null).isLeft)
    assert(validateMarketCode("USD-BTC").isLeft)
  }

  test("timestamp validation: event must not be after received") {
    assert(validateTimestamps(100L, 100L).isRight)
    assert(validateTimestamps(100L, 101L).isRight)
    assert(validateTimestamps(101L, 100L).isLeft)
  }

  test("ws url validation: scheme and host enforced") {
    assert(validateWsUrl("wss://api.upbit.com/websocket/v1").isRight)
    assert(validateWsUrl("ws://localhost:8080/feed").isRight)
    assert(validateWsUrl("https://api.upbit.com").isLeft)
    assert(validateWsUrl("wss://").isLeft)
    assert(validateWsUrl("").isLeft)
    assert(validateWsUrl("::not a url::").isLeft)
  }

  test("failure gate: trips at 10 consecutive failures, any success resets") {
    var g = FailureGate()
    (1 to 9).foreach(_ => g = g.onFailure)
    assert(!g.tripped)
    g = g.onFailure
    assert(g.tripped)
    assert(!g.onSuccess.tripped)
    // a success mid-streak resets the count entirely
    var h = FailureGate()
    (1 to 9).foreach(_ => h = h.onFailure)
    h = h.onSuccess
    (1 to 9).foreach(_ => h = h.onFailure)
    assert(!h.tripped)
  }

  test("connection tracker: legal transitions advance, illegal are logged rejections") {
    var t = ConnTracker()
    t = t.to(Connecting, 1L)
    t = t.to(Connected, 2L)
    t = t.to(Connecting, 3L) // illegal from CONNECTED
    assert(t.state == Connected)
    assert(t.rejectedCount == 1)
    t = t.to(Reconnecting, 4L)
    t = t.to(Connected, 5L)
    assert(t.state == Connected)
    assert(t.history.size == 5)
    assert(t.history.map(_.accepted) == Vector(true, true, false, true, true))
  }

  test("connection tracker: history is bounded") {
    var t = ConnTracker(maxHistory = 3)
    (1 to 10).foreach(i => t = t.to(if (i % 2 == 1) Connecting else Failed, i.toLong))
    assert(t.history.size == 3)
  }
}
