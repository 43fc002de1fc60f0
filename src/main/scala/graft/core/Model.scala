package graft.core

import java.sql.Timestamp

/**
 * Domain records mirrored from the reference's typed entities and proto
 * schema (reference: src/pyflink_examples/fraud_detection/entities.py:11-44,
 * proto/market_data.proto:9-45, proto/common.proto:6-32,
 * src/data_ingestion/domain/models/market_data.py:45-112).
 *
 * All case classes are `Product`s so `Dataset[T]` gets a Catalyst
 * `Encoder` for free (columnar Tungsten layout at execution time even
 * though the API surface is row-typed, matching the reference's
 * row-at-a-time entities without its per-record Python overhead).
 */
object Model {

  /** reference: entities.py:11-28 (timestamp = epoch millis). */
  final case class Transaction(accountId: Long, timestamp: Long, amount: Double)

  /** reference: entities.py:31-44. */
  final case class Alert(accountId: Long, amount: Double, timestamp: Long, message: String)

  /** State kept per account by the fraud detector (reference:
    * fraud_detector.py:53-62 — two ValueStates: flag + timer). */
  final case class FraudState(smallSeen: Boolean, timerTs: Long)

  /** reference: proto/market_data.proto:36-39 (repeated OrderBookLevel). */
  final case class OrderBookLevel(price: Double, size: Double)

  /** reference: proto/market_data.proto:9-24. */
  final case class Trade(
      exchange: String,
      code: String,
      tradePrice: Double,
      tradeVolume: Double,
      askBid: String,
      prevClosingPrice: Double,
      change: String,
      changePrice: Double,
      tradeTimestampMs: Long,
      sequentialId: Long,
      streamType: String,
      receivedTimestampMs: Long)

  /** reference: proto/market_data.proto:27-45. */
  final case class OrderBookUpdate(
      exchange: String,
      code: String,
      totalAskSize: Double,
      totalBidSize: Double,
      asks: Seq[OrderBookLevel],
      bids: Seq[OrderBookLevel],
      streamType: String,
      eventTimestampMs: Long,
      receivedTimestampMs: Long)

  /** reference: docs arch doc:933-975 (financial fields Decimal prec 28). */
  final case class TradingSignal(
      signalId: String,
      code: String,
      side: String,    // BUY | SELL
      reason: String,
      priceAtSignal: BigDecimal,
      signalTimestampMs: Long)

  /** reference: arch doc:604-621, 추후 과제.md:119-219 (status machine). */
  final case class PositionInfo(
      entrySignalId: String,
      entryReason: String,
      code: String,
      entryPrice: BigDecimal,
      entryTimestampMs: Long,
      volume: BigDecimal,
      status: String,  // PENDING_OPEN | OPEN | PENDING_CLOSE
      pendingExitSignalId: String)

  /** reference: arch doc:1124-1146. */
  final case class ExecutionFeedback(
      signalId: String,
      code: String,
      status: String,  // SUCCESS | FAILED | TIMEOUT
      errorMessage: String,
      feedbackTimestampMs: Long)

  /** Row of the driver `events` table, used to replay the reference's
    * keyed-stream patterns over deterministic data (TESTDATA.md). */
  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)
}
