package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.core.Domain._

/** ScalaCheck property suite for the pure domain functions (runs under
  * `sbt test` via the ScalaCheck framework; no scalatestplus bridge in
  * the offline cache). */
object DomainProps extends Properties("Domain") {

  private def samples(n: Int, vol: Double): Seq[(Long, BigDecimal)] =
    (0 until n).map(i => (i * 1000L, BigDecimal(vol)))

  property("densityChangeRate: scale 4 and exact formula") =
    forAll(Gen.choose(0.01, 10000.0), Gen.choose(0.01, 10000.0)) { (cur, base) =>
      densityChangeRate(BigDecimal(cur), samples(20, base), 60000L, 0L) match {
        case DensityChange(rate) =>
          val expected = ((BigDecimal(1)(FinContext) -
            BigDecimal(cur)(FinContext) / BigDecimal(base)) * 100)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          rate.scale == 4 && rate == expected
        case WarmingUp => false
      }
    }

  property("densityChangeRate: insufficient samples always warms up") =
    forAll(Gen.choose(0, 9), Gen.choose(0.01, 100.0)) { (n, base) =>
      densityChangeRate(BigDecimal(1), samples(n, base), 60000L, 0L) == WarmingUp
    }

  property("backoff: bounded by cap and monotone") =
    forAll(Gen.choose(0, 62), Gen.choose(1, 600)) { (n, cap) =>
      backoffSeconds(n, cap) <= cap.toDouble &&
        backoffSeconds(n, cap) <= backoffSeconds(n + 1, cap)
    }

  property("signal id: invariant within a second, 64 lowercase hex") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.choose(0L, 4e12.toLong),
           Gen.choose(0, 999)) { (code, secMs, offset) =>
      val base = (secMs / 1000) * 1000
      val a = deterministicSignalId(code, "BUY", "PWAVE", base)
      val b = deterministicSignalId(code, "BUY", "PWAVE", base + offset)
      a == b && a.matches("[0-9a-f]{64}")
    }

  property("FSM: transition agrees with canTransition") = {
    val genState = Gen.oneOf(AllConnStates)
    forAll(genState, genState) { (from, to) =>
      transition(from, to).isRight == canTransition(from, to)
    }
  }

  property("market code: accepted codes are normalized KRW- uppercase") =
    forAll(Gen.alphaStr) { s =>
      validateMarketCode("krw-" + s) match {
        case Right(norm) => norm == ("KRW-" + s).toUpperCase.trim
        case Left(_) => ("krw-" + s).trim.isEmpty // only empty rejected
      }
    }
}
