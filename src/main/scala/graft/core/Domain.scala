package graft.core

import java.math.{MathContext, RoundingMode}
import java.security.MessageDigest

/**
 * Pure domain functions — zero Spark imports, mirroring the reference's
 * explicit purity rule (reference: docs/project docs/
 * "2. CEP 레이어...md":81-84 — domain math kept framework-free so it can be
 * unit-tested without a cluster).
 */
object Domain {

  /** Financial math context: precision 28, HALF_UP — reference: CEP
    * doc:96 (`getcontext().prec = 28`). */
  val FinContext = new MathContext(28, RoundingMode.HALF_UP)

  /** Density-change result (reference: CEP doc:111-149). */
  sealed trait DensityResult
  case object WarmingUp extends DensityResult
  final case class DensityChange(ratePct: BigDecimal) extends DensityResult

  /**
   * Rate of decline of current top-N ask depth vs the trailing-window
   * mean, as a percentage quantized to 4 dp HALF_UP.
   * reference: CEP doc:111-149 (`calculate_orderbook_density_change`):
   * warm-up when fewer than `minSamples` samples, when less than
   * `warmupSeconds` of history, or when the baseline is zero.
   *
   * @param recentAskVolumes (epochMillis, volume) samples already inside
   *                         the trailing window (caller prunes by window)
   */
  def densityChangeRate(
      currentTotalAskSize: BigDecimal,
      recentAskVolumes: Seq[(Long, BigDecimal)],
      nowMs: Long,
      firstSeenMs: Long,
      warmupSeconds: Int = 30,
      minSamples: Int = 10): DensityResult = {
    if (recentAskVolumes.size < minSamples) WarmingUp
    else if (nowMs - firstSeenMs < warmupSeconds * 1000L) WarmingUp
    else {
      val sum = recentAskVolumes.iterator.map(_._2).foldLeft(BigDecimal(0))(_ + _)
      val baseline = sum(FinContext) / BigDecimal(recentAskVolumes.size)
      if (baseline.signum == 0) WarmingUp
      else {
        val rate = (BigDecimal(1)(FinContext) - currentTotalAskSize(FinContext) / baseline) * 100
        DensityChange(rate.setScale(4, BigDecimal.RoundingMode.HALF_UP))
      }
    }
  }

  /**
   * Deterministic signal id: sha256 over (code, side, reason,
   * event-ts truncated to the second) — idempotent across replays.
   * reference: CEP doc:153-161, arch doc:977-997.
   */
  def deterministicSignalId(code: String, side: String, reason: String, eventTsMs: Long): String =
    sha256Hex(s"$code|$side|$reason|${eventTsMs / 1000}")

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // -------------------------------------------------------------------
  // Connection state machine (reference: src/data_ingestion/domain/
  // models/connection_state.py:25-127; transition matrix at :69-75).
  // Ops concern for a live connector, not a query operator — kept for
  // surface parity and property tests.
  // -------------------------------------------------------------------
  sealed abstract class ConnState(val name: String)
  case object Disconnected extends ConnState("DISCONNECTED")
  case object Connecting extends ConnState("CONNECTING")
  case object Connected extends ConnState("CONNECTED")
  case object Reconnecting extends ConnState("RECONNECTING")
  case object Failed extends ConnState("FAILED")

  val AllConnStates: Seq[ConnState] =
    Seq(Disconnected, Connecting, Connected, Reconnecting, Failed)

  /** Legal transitions (self-transitions always legal — reference
    * connection_state.py:98-104 idempotent self-loop). */
  private val transitions: Map[ConnState, Set[ConnState]] = Map(
    Disconnected -> Set(Connecting),
    Connecting   -> Set(Connected, Failed),
    Connected    -> Set(Disconnected, Reconnecting, Failed),
    Reconnecting -> Set(Connected, Failed, Disconnected),
    Failed       -> Set(Disconnected))

  def canTransition(from: ConnState, to: ConnState): Boolean =
    from == to || transitions(from).contains(to)

  def transition(from: ConnState, to: ConnState): Either[String, ConnState] =
    if (canTransition(from, to)) Right(to)
    else Left(s"illegal transition ${from.name} -> ${to.name}")

  /** Exponential reconnect backoff: min(2^attempt, cap) seconds —
    * reference: base_websocket.py:364-383. */
  def backoffSeconds(attempt: Int, capSeconds: Int = 60): Double =
    math.min(math.pow(2.0, attempt.toDouble), capSeconds.toDouble)

  // -------------------------------------------------------------------
  // Message validation (reference: market_data.py:147-239,
  // exchange_config.py:47-81): non-empty exchange, KRW- prefix after
  // upper-casing, event_ts <= received_ts, non-empty payload.
  // -------------------------------------------------------------------
  final case class ValidationError(field: String, reason: String)

  def validateMarketCode(code: String): Either[ValidationError, String] = {
    val norm = Option(code).map(_.trim.toUpperCase).getOrElse("")
    if (norm.isEmpty) Left(ValidationError("code", "empty"))
    else if (!norm.startsWith("KRW-")) Left(ValidationError("code", s"bad prefix: $norm"))
    else Right(norm)
  }

  def validateTimestamps(eventTsMs: Long, receivedTsMs: Long): Either[ValidationError, Unit] =
    if (eventTsMs > receivedTsMs)
      Left(ValidationError("event_timestamp", "after received_timestamp"))
    else Right(())

  /** WebSocket endpoint validation (reference: exchange_config.py:83-89
    * — scheme must be ws/wss and a host must be present). */
  def validateWsUrl(url: String): Either[ValidationError, String] = {
    val trimmed = Option(url).map(_.trim).getOrElse("")
    if (trimmed.isEmpty) Left(ValidationError("url", "empty"))
    else
      try {
        val u = new java.net.URI(trimmed)
        if (u.getScheme != "ws" && u.getScheme != "wss")
          Left(ValidationError("url", s"scheme must be ws/wss: $trimmed"))
        else if (u.getHost == null || u.getHost.isEmpty)
          Left(ValidationError("url", s"missing host: $trimmed"))
        else Right(trimmed)
      } catch {
        case _: java.net.URISyntaxException => Left(ValidationError("url", s"unparseable: $trimmed"))
      }
  }

  // -------------------------------------------------------------------
  // Consecutive-failure circuit breaker (reference:
  // ingestion_service.py:184-203, 339-353 — stop the consume loop after
  // 10 consecutive publish failures; any success resets the streak).
  // -------------------------------------------------------------------
  final case class FailureGate(maxConsecutive: Int = 10, streak: Int = 0) {
    def tripped: Boolean = streak >= maxConsecutive
    def onSuccess: FailureGate = copy(streak = 0)
    def onFailure: FailureGate = copy(streak = math.min(streak + 1, maxConsecutive))
  }

  // -------------------------------------------------------------------
  // Connection-state history tracker (reference:
  // connection_state.py:129-217 — bounded transition log with legality
  // enforcement; illegal transitions are recorded as rejected and do
  // not change state).
  // -------------------------------------------------------------------
  final case class ConnTransition(from: ConnState, to: ConnState, atMs: Long, accepted: Boolean)

  final case class ConnTracker(
      state: ConnState = Disconnected,
      history: Vector[ConnTransition] = Vector.empty,
      maxHistory: Int = 100) {
    def to(next: ConnState, atMs: Long): ConnTracker = {
      val ok = canTransition(state, next)
      val entry = ConnTransition(state, next, atMs, ok)
      copy(
        state = if (ok) next else state,
        history = (history :+ entry).takeRight(maxHistory))
    }
    def rejectedCount: Int = history.count(!_.accepted)
  }

  // -------------------------------------------------------------------
  // Fraud-detection constants (reference: fraud_detector.py:35-37).
  // -------------------------------------------------------------------
  val SmallAmount: Double = 1.00
  val LargeAmount: Double = 500.00
  val FraudWindowMs: Long = 60000L
}
