package graft.core

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Model.{OrderBookLevel, OrderBookUpdate, Trade}
import graft.operators.UpbitWire

/**
 * Extended wire-codec coverage mirroring the reference's
 * test_protobuf_mapper_extended.py: full-chain roundtrip (JSON → parse
 * → serialize → deserialize), timestamp precision boundaries, zero
 * preservation, float precision, level ordering, and the serialization
 * throughput budget.
 */
class ProtoRoundTripSpec extends SparkSpec {

  test("roundtrip preserves all fields through the full chain (extended:27-62)") {
    import spark.implicits._
    val json =
      """{"type":"trade","code":"KRW-BTC","trade_price":50123456.78,
        |"trade_volume":0.123456789,"ask_bid":"ASK","prev_closing_price":49000000.5,
        |"change":"RISE","change_price":1123456.28,
        |"trade_timestamp":1730200000123,"sequential_id":9876543210}""".stripMargin.replace("\n", "")
    val t = UpbitWire.parseTrades(Seq(json).toDF("value"), "value", "upbit",
      lit(1730300000000L)).head()
    val d = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(t))
    assert(d.code === "KRW-BTC")
    assert(d.tradePrice === 50123456.78)
    assert(d.tradeVolume === 0.123456789)
    assert(d.askBid === "ASK")
    assert(d.prevClosingPrice === 49000000.5)
    assert(d.change === "RISE")
    assert(d.changePrice === 1123456.28)
    assert(d.sequentialId === 9876543210L)
    // timestamp precision: seconds*1000 + nanos/1e6 reconstructs the ms
    val (sec, nanos) = ProtoCodec.splitMillis(d.tradeTimestampMs)
    assert(sec * 1000 + nanos / 1000000 === 1730200000123L)
  }

  test("timestamp precision at boundaries: 0, 999, typical, int32-seconds edge (extended:68-90)") {
    for (ms <- Seq(0L, 999L, 1730200000123L, 2147483647000L)) {
      val t = Trade("UPBIT", "KRW-BTC", 1000.0, 1.0, "", 0.0, "", 0.0, ms, 0L, "REALTIME", 0L)
      val d = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(t))
      assert(d.tradeTimestampMs === ms, s"ms=$ms")
      val (sec, nanos) = ProtoCodec.splitMillis(ms)
      assert(sec * 1000 + nanos / 1000000 === ms)
    }
  }

  test("zero values survive the wire (proto3 defaults are values, not nulls) (extended:92-113)") {
    val t = Trade("UPBIT", "KRW-BTC", 0.0, 0.0, "", 0.0, "", 0.0, 1730200000123L, 0L, "REALTIME", 0L)
    val d = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(t))
    assert(d.tradePrice === 0.0)
    assert(d.tradeVolume === 0.0)
    assert(d.prevClosingPrice === 0.0)
    assert(d.changePrice === 0.0)
    assert(d.sequentialId === 0L)
  }

  test("float precision preserved bit-exactly (extended:183-198: within 1e-9/1e-12)") {
    val t = Trade("UPBIT", "KRW-BTC", 50123456.789012, 0.123456789012, "BID",
      0.0, "", 0.0, 1L, 0L, "REALTIME", 0L)
    val d = ProtoCodec.decodeTrade(ProtoCodec.encodeTrade(t))
    // fixed64 carries the raw IEEE bits: stronger than the reference's approx
    assert(java.lang.Double.doubleToLongBits(d.tradePrice) ===
      java.lang.Double.doubleToLongBits(50123456.789012))
    assert(java.lang.Double.doubleToLongBits(d.tradeVolume) ===
      java.lang.Double.doubleToLongBits(0.123456789012))
  }

  test("orderbook level order is preserved (extended:200-229)") {
    val asks = (0 until 3).map(i => OrderBookLevel(4000000.0 + i * 1000, 10.0 + i))
    val bids = (0 until 3).map(i => OrderBookLevel(3999000.0 - i * 1000, 20.0 + i))
    val o = OrderBookUpdate("UPBIT", "KRW-ETH", 100.0, 200.0, asks, bids,
      "REALTIME", 1730201111222L, 0L)
    val d = ProtoCodec.decodeOrderBook(ProtoCodec.encodeOrderBook(o))
    assert(d.asks.map(_.price) === Seq(4000000.0, 4001000.0, 4002000.0))
    assert(d.bids.map(_.price) === Seq(3999000.0, 3998000.0, 3997000.0))
    assert(d.asks.map(_.size) === Seq(10.0, 11.0, 12.0))
  }

  test("1000 trade serializations fit the reference's 100 ms budget (extended:119-143)") {
    val t = Trade("UPBIT", "KRW-BTC", 50000000.0, 0.01, "BID", 49500000.0,
      "RISE", 500000.0, 1730200000123L, 1234567890L, "REALTIME", 1730200001000L)
    ProtoCodec.encodeTrade(t) // warm up
    val start = System.nanoTime()
    var i = 0
    while (i < 1000) { ProtoCodec.encodeTrade(t); i += 1 }
    val elapsedMs = (System.nanoTime() - start) / 1e6
    info(f"1000 trade encodes: $elapsedMs%.2f ms")
    assert(elapsedMs < 100.0, f"too slow: $elapsedMs%.2f ms for 1000 messages")
  }

  test("1000 15-level orderbook serializations fit the 200 ms budget (extended:145-170)") {
    val units = (0 until 15).map(i => OrderBookLevel(4000000.0 + i * 1000, 1.1))
    val o = OrderBookUpdate("UPBIT", "KRW-ETH", 123.45, 234.56, units, units,
      "REALTIME", 1730201111222L, 0L)
    ProtoCodec.encodeOrderBook(o) // warm up
    val start = System.nanoTime()
    var i = 0
    while (i < 1000) { ProtoCodec.encodeOrderBook(o); i += 1 }
    val elapsedMs = (System.nanoTime() - start) / 1e6
    info(f"1000 orderbook encodes: $elapsedMs%.2f ms")
    assert(elapsedMs < 200.0, f"too slow: $elapsedMs%.2f ms for 1000 messages")
  }
}
