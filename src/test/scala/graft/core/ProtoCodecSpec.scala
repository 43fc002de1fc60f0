package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model.{OrderBookLevel, OrderBookUpdate, Trade}

/**
 * Wire-codec spec mirroring the reference's protobuf mapper fixtures
 * (reference: tests/.../serialization/test_protobuf_mapper.py:17-104)
 * plus proto3 wire-format properties (default omission, unknown-field
 * skipping, field-order independence) the reference gets for free from
 * libprotobuf and we must prove ourselves.
 */
class ProtoCodecSpec extends AnyFunSuite {

  /** The trade fixture of test_protobuf_mapper.py:20-51. */
  private val fixtureTrade = Trade(
    exchange = "UPBIT",
    code = "KRW-BTC",
    tradePrice = 50000000.0,
    tradeVolume = 0.01,
    askBid = "BID",
    prevClosingPrice = 49500000.0,
    change = "RISE",
    changePrice = 500000.0,
    tradeTimestampMs = 1730200000123L,
    sequentialId = 1234567890L,
    streamType = "REALTIME",
    receivedTimestampMs = 1730200001000L)

  /** The orderbook fixture of test_protobuf_mapper.py:55-86. */
  private val fixtureBook = OrderBookUpdate(
    exchange = "UPBIT",
    code = "KRW-ETH",
    totalAskSize = 123.45,
    totalBidSize = 234.56,
    asks = Seq(OrderBookLevel(4000000.0, 1.1), OrderBookLevel(4001000.0, 1.0)),
    bids = Seq(OrderBookLevel(3999000.0, 2.2), OrderBookLevel(3998000.0, 2.0)),
    streamType = "REALTIME",
    eventTimestampMs = 1730201111222L,
    receivedTimestampMs = 1730201112000L)

  test("trade round-trips through the wire field-by-field (test_protobuf_mapper.py:18-51)") {
    val decoded = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(fixtureTrade))
    assert(decoded.code === "KRW-BTC")
    assert(decoded.exchange === "UPBIT")
    assert(decoded.tradePrice === 50000000.0)
    assert(decoded.tradeVolume === 0.01)
    assert(decoded.askBid === "BID")
    assert(decoded.prevClosingPrice === 49500000.0)
    assert(decoded.change === "RISE")
    assert(decoded.changePrice === 500000.0)
    assert(decoded.tradeTimestampMs === 1730200000123L)
    assert(decoded.sequentialId === 1234567890L)
    assert(decoded.streamType === "REALTIME")
    assert(decoded.receivedTimestampMs > 0L)
    assert(decoded === fixtureTrade)
  }

  test("timestamp splits into {seconds, nanos} like _timestamp_from_millis (protobuf_mapper.py:69-75)") {
    assert(ProtoCodec.splitMillis(1730200000123L) === ((1730200000L, 123000000)))
    assert(ProtoCodec.splitMillis(1730201111222L) === ((1730201111L, 222000000)))
    assert(ProtoCodec.splitMillis(5000L) === ((5L, 0)))
  }

  test("orderbook round-trips with level lists intact (test_protobuf_mapper.py:55-86)") {
    val decoded = ProtoCodec.decodeOrderBook(ProtoCodec.encodeOrderBook(fixtureBook))
    assert(decoded.code === "KRW-ETH")
    assert(decoded.exchange === "UPBIT")
    assert(decoded.totalAskSize === 123.45)
    assert(decoded.totalBidSize === 234.56)
    assert(decoded.asks.length === 2)
    assert(decoded.bids.length === 2)
    assert(decoded.asks.head === OrderBookLevel(4000000.0, 1.1))
    assert(decoded.bids.head === OrderBookLevel(3999000.0, 2.2))
    assert(decoded.eventTimestampMs === 1730201111222L)
    assert(decoded.streamType === "REALTIME")
    assert(decoded === fixtureBook)
  }

  test("proto3 defaults are omitted: the all-defaults trade encodes to zero bytes") {
    val empty = Trade("", "", 0.0, 0.0, "", 0.0, "", 0.0, 0L, 0L, "", 0L)
    // timestamp fields still write an (empty) sub-message tag each; all
    // scalar/enum/string defaults must be absent.
    val bytes = ProtoCodec.encodeTrade(empty)
    // field 9 and 12 headers (tag + zero length) only: 2 bytes each.
    assert(bytes.length === 4)
    assert(ProtoCodec.decodeTrade(bytes) === empty)
  }

  test("unknown enum names map to UNSPECIFIED(0) and decode to unset (protobuf_mapper.py:85-101)") {
    val weird = fixtureTrade.copy(exchange = "BINANCE", askBid = "???", change = "")
    val decoded = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(weird))
    assert(decoded.exchange === "")
    assert(decoded.askBid === "")
    assert(decoded.change === "")
  }

  test("decoder skips unknown fields (forward compatibility)") {
    val base = ProtoCodec.encodeTrade(fixtureTrade)
    // Append unused fields 13 (varint), 14 (length-delimited) and
    // 15 (fixed32) — a newer writer's extra fields, one per wire type.
    val extra = Array[Byte](
      ((13 << 3) | 0).toByte, 0x2a,                   // field 13, varint 42
      ((14 << 3) | 2).toByte, 3, 0x61, 0x62, 0x63,    // field 14, "abc"
      ((15 << 3) | 5).toByte, 1, 2, 3, 4)             // field 15, fixed32
    val decoded = ProtoCodec.decodeTrade(base ++ extra)
    assert(decoded === fixtureTrade)
  }

  test("decoder is field-order independent (accepts non-canonical writers)") {
    // Hand-encode {code="AB" (field 2), exchange=UPBIT (field 1)} in
    // reverse field order.
    val bytes = Array[Byte](
      ((2 << 3) | 2).toByte, 2, 0x41, 0x42, // code = "AB"
      ((1 << 3) | 0).toByte, 1)             // exchange = 1 (UPBIT)
    val decoded = ProtoCodec.decodeTrade(bytes)
    assert(decoded.code === "AB")
    assert(decoded.exchange === "UPBIT")
  }

  test("varint survives multi-byte and Long-boundary values") {
    for (seq <- Seq(1L, 127L, 128L, 300L, 1234567890L, Long.MaxValue)) {
      val t = fixtureTrade.copy(sequentialId = seq)
      assert(ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(t)).sequentialId === seq)
    }
  }

  test("truncated payload fails loudly instead of returning garbage") {
    val bytes = ProtoCodec.encodeTrade(fixtureTrade)
    intercept[Exception] {
      ProtoCodec.decodeTrade(bytes.take(bytes.length - 3))
    }
  }
}
