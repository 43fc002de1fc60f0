package graft.core

import java.io.ByteArrayOutputStream

import graft.core.Model.{OrderBookLevel, OrderBookUpdate, Trade}

/**
 * Proto3 wire-format codec for the reference's market-data schema
 * (reference: proto/market_data.proto:9-45, proto/common.proto:6-32) —
 * the engine's Kafka value format. No protobuf runtime is available in
 * this environment, so this is a self-contained implementation of the
 * (public, stable) proto3 encoding: varint, fixed64 and
 * length-delimited wire types, canonical field-number order, and
 * proto3 default-omission (zero scalars / empty strings / UNSPECIFIED
 * enums are not written; message fields are written when set).
 *
 * `google.protobuf.Timestamp` fields are carried as epoch-millis longs
 * on the Scala side and split into {seconds, nanos} on the wire
 * exactly like the reference's `_timestamp_from_millis`
 * (protobuf_mapper.py:69-75).
 *
 * The decoder is a real wire parser: it accepts fields in any order,
 * skips unknown field numbers, and tolerates non-canonical writers —
 * so payloads produced by the reference's Python pipeline decode
 * correctly.
 */
object ProtoCodec {

  // -- enum tables (common.proto:6-32) --------------------------------
  val ExchangeByName: Map[String, Int] = Map("UPBIT" -> 1)
  val AskBidByName: Map[String, Int] = Map("ASK" -> 1, "BID" -> 2)
  val ChangeByName: Map[String, Int] = Map("RISE" -> 1, "EVEN" -> 2, "FALL" -> 3)
  val StreamByName: Map[String, Int] = Map("SNAPSHOT" -> 1, "REALTIME" -> 2)

  private def inv(m: Map[String, Int]): Map[Int, String] = m.map(_.swap)
  private val ExchangeByNum = inv(ExchangeByName)
  private val AskBidByNum = inv(AskBidByName)
  private val ChangeByNum = inv(ChangeByName)
  private val StreamByNum = inv(StreamByName)

  /** Name → enum number; unknown/empty maps to 0 (UNSPECIFIED), the
    * reference's `_to_*_enum` fallback (protobuf_mapper.py:85-101). */
  private def enumNum(m: Map[String, Int], name: String): Int =
    if (name == null || name.isEmpty) 0 else m.getOrElse(name.trim.toUpperCase, 0)

  /** Enum number → name; 0/unknown decodes to "" (unset). */
  private def enumName(m: Map[Int, String], num: Int): String = m.getOrElse(num, "")

  // -- writer ---------------------------------------------------------
  private final class Writer {
    val out = new ByteArrayOutputStream(64)

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

    /** double field, omitted when 0.0 (proto3 default). */
    def dbl(field: Int, v: Double): Unit =
      if (java.lang.Double.doubleToRawLongBits(v) != 0L) {
        tag(field, 1)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      }
    def int64(field: Int, v: Long): Unit = if (v != 0L) { tag(field, 0); varint(v) }
    def enum(field: Int, v: Int): Unit = if (v != 0) { tag(field, 0); varint(v.toLong) }
    def str(field: Int, v: String): Unit =
      if (v != null && v.nonEmpty) {
        val b = v.getBytes("UTF-8")
        tag(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
      }
    def msg(field: Int, body: Array[Byte]): Unit = {
      tag(field, 2); varint(body.length.toLong); out.write(body, 0, body.length)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Epoch millis → `google.protobuf.Timestamp` {seconds, nanos}
    * split, exactly `_timestamp_from_millis` (protobuf_mapper.py:69-75). */
  def splitMillis(ms: Long): (Long, Int) = (ms / 1000, ((ms % 1000) * 1000000L).toInt)

  /** Timestamp message body: {seconds=1, nanos=2} from epoch millis. */
  private def timestampBody(ms: Long): Array[Byte] = {
    val w = new Writer
    val (seconds, nanos) = splitMillis(ms)
    w.int64(1, seconds)
    if (nanos != 0) { w.tag(2, 0); w.varint(nanos.toLong) }
    w.bytes
  }

  private def levelBody(l: OrderBookLevel): Array[Byte] = {
    val w = new Writer
    w.dbl(1, l.price); w.dbl(2, l.size)
    w.bytes
  }

  def encodeTrade(t: Trade): Array[Byte] = {
    val w = new Writer
    w.enum(1, enumNum(ExchangeByName, t.exchange))
    w.str(2, t.code)
    w.dbl(3, t.tradePrice)
    w.dbl(4, t.tradeVolume)
    w.enum(5, enumNum(AskBidByName, t.askBid))
    w.dbl(6, t.prevClosingPrice)
    w.enum(7, enumNum(ChangeByName, t.change))
    w.dbl(8, t.changePrice)
    w.msg(9, timestampBody(t.tradeTimestampMs))
    w.int64(10, t.sequentialId)
    w.enum(11, enumNum(StreamByName, t.streamType))
    w.msg(12, timestampBody(t.receivedTimestampMs))
    w.bytes
  }

  def encodeOrderBook(o: OrderBookUpdate): Array[Byte] = {
    val w = new Writer
    w.enum(1, enumNum(ExchangeByName, o.exchange))
    w.str(2, o.code)
    w.dbl(3, o.totalAskSize)
    w.dbl(4, o.totalBidSize)
    o.asks.foreach(l => w.msg(5, levelBody(l)))
    o.bids.foreach(l => w.msg(6, levelBody(l)))
    w.enum(7, enumNum(StreamByName, o.streamType))
    w.msg(8, timestampBody(o.eventTimestampMs))
    w.msg(9, timestampBody(o.receivedTimestampMs))
    w.bytes
  }

  // -- reader ---------------------------------------------------------
  private final class Reader(buf: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasNext: Boolean = pos < until

    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("malformed varint")
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def dbl(): Double = java.lang.Double.longBitsToDouble(fixed64())
    def lenDelim(): (Int, Int) = {
      val len = varint().toInt
      val start = pos
      pos += len
      if (pos > until) throw new IllegalArgumentException("truncated length-delimited field")
      (start, start + len)
    }
    def strField(): String = { val (s, e) = lenDelim(); new String(buf, s, e - s, "UTF-8") }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelim()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def readTimestampMs(buf: Array[Byte], from: Int, until: Int): Long = {
    val r = new Reader(buf, from, until)
    var seconds = 0L; var nanos = 0L
    while (r.hasNext) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => seconds = r.varint()
        case 2 => nanos = r.varint()
        case _ => r.skip(wire)
      }
    }
    seconds * 1000 + nanos / 1000000
  }

  private def readLevel(buf: Array[Byte], from: Int, until: Int): OrderBookLevel = {
    val r = new Reader(buf, from, until)
    var price = 0.0; var size = 0.0
    while (r.hasNext) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => price = r.dbl()
        case 2 => size = r.dbl()
        case _ => r.skip(wire)
      }
    }
    OrderBookLevel(price, size)
  }

  def decodeTrade(bytes: Array[Byte]): Trade = {
    val r = new Reader(bytes, 0, bytes.length)
    var exchange = 0; var code = ""; var tp = 0.0; var tv = 0.0; var ab = 0
    var pcp = 0.0; var ch = 0; var cp = 0.0; var tts = 0L; var seq = 0L
    var st = 0; var rts = 0L
    while (r.hasNext) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => exchange = r.varint().toInt
        case 2 => code = r.strField()
        case 3 => tp = r.dbl()
        case 4 => tv = r.dbl()
        case 5 => ab = r.varint().toInt
        case 6 => pcp = r.dbl()
        case 7 => ch = r.varint().toInt
        case 8 => cp = r.dbl()
        case 9 => val (s, e) = r.lenDelim(); tts = readTimestampMs(bytes, s, e)
        case 10 => seq = r.varint()
        case 11 => st = r.varint().toInt
        case 12 => val (s, e) = r.lenDelim(); rts = readTimestampMs(bytes, s, e)
        case _ => r.skip(wire)
      }
    }
    Trade(enumName(ExchangeByNum, exchange), code, tp, tv,
      enumName(AskBidByNum, ab), pcp, enumName(ChangeByNum, ch), cp,
      tts, seq, enumName(StreamByNum, st), rts)
  }

  def decodeOrderBook(bytes: Array[Byte]): OrderBookUpdate = {
    val r = new Reader(bytes, 0, bytes.length)
    var exchange = 0; var code = ""; var tas = 0.0; var tbs = 0.0
    val asks = Seq.newBuilder[OrderBookLevel]; val bids = Seq.newBuilder[OrderBookLevel]
    var st = 0; var ets = 0L; var rts = 0L
    while (r.hasNext) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => exchange = r.varint().toInt
        case 2 => code = r.strField()
        case 3 => tas = r.dbl()
        case 4 => tbs = r.dbl()
        case 5 => val (s, e) = r.lenDelim(); asks += readLevel(bytes, s, e)
        case 6 => val (s, e) = r.lenDelim(); bids += readLevel(bytes, s, e)
        case 7 => st = r.varint().toInt
        case 8 => val (s, e) = r.lenDelim(); ets = readTimestampMs(bytes, s, e)
        case 9 => val (s, e) = r.lenDelim(); rts = readTimestampMs(bytes, s, e)
        case _ => r.skip(wire)
      }
    }
    OrderBookUpdate(enumName(ExchangeByNum, exchange), code, tas, tbs,
      asks.result(), bids.result(), enumName(StreamByNum, st), ets, rts)
  }
}
