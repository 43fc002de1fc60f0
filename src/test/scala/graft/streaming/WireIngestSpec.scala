package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf0001

class WireIngestSpec extends SparkSpec {
  import spark.implicits._

  test("wire ingest: duplicate delivery collapses and a replay of the whole chain is a no-op") {
    val first = WireIngest.qWireIngest(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    // each frame was delivered twice; the store must hold each key once
    val keys = first.map(r => (r(1), r(9))) // (code, sequential_id)
    assert(keys.distinct.size == keys.size)
    // second end-to-end run (same session → same store): the append
    // must be a no-op and the read-back identical — the replays-are-
    // no-ops contract the idempotent sink exists for
    val second = WireIngest.qWireIngest(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(second == first)
  }

  test("wire ingest: checkpointed restart with redelivered frames is exactly-once end-to-end") {
    // The recovery half of the K3 story the in-session tests can't see:
    // a CHECKPOINTED streaming query over a file source is stopped
    // (crash stand-in) and restarted on the same checkpoint while the
    // upstream redelivers already-ingested frames (the at-least-once
    // reality after a failover). Source checkpointing must skip the
    // files already committed, and the idempotent sink must collapse
    // the redelivered keys in the new files — the store ends exactly
    // at the unique-frame parse, byte-identical to a one-shot batch
    // run of the whole chain.
    def mkFrame(seq: Long, price: Double): String = {
      val f = s"""{"type":"trade","code":"KRW-CK","trade_price":$price,""" +
        s""""trade_volume":2.0,"ask_bid":"ASK","prev_closing_price":1.0,""" +
        s""""change":"RISE","change_price":0.5,"trade_timestamp":${1000 + seq},""" +
        s""""sequential_id":$seq}"""
      val escaped = f.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"ts_ms":${2000 + seq},"frame":"$escaped"}"""
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_test").toString
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"
    val store = s"$tmp/store"; val refStore = s"$tmp/ref"
    new java.io.File(inDir).mkdirs()

    def chain(batch: org.apache.spark.sql.DataFrame, path: String): Unit = {
      val trades = graft.operators.UpbitWire.parseTrades(
        batch, "frame", "Upbit", col("ts_ms") + 5)
      val decoded = Streams.tradesFromProtoRecords(Streams.tradeProtoRecords(trades))
      Streams.idempotentAppend(decoded.toDF(), Seq("code", "sequentialId"), path)
    }
    def start() = spark.readStream
      .schema("ts_ms LONG, frame STRING")
      .json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => chain(b, store) }
      .start()

    val batch1 = (1L to 5L).map(i => mkFrame(i, i * 1.5))
    val batch2Redelivered = (3L to 5L).map(i => mkFrame(i, i * 1.5)) // dupes of batch 1
    val batch2New = (6L to 8L).map(i => mkFrame(i, i * 1.5))

    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/a.json"),
      batch1.mkString("\n").getBytes)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // "crash" after commit

    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/b.json"),
      (batch2Redelivered ++ batch2New).mkString("\n").getBytes)
    val q2 = start() // same checkpoint: file a.json must not re-process
    try q2.processAllAvailable() finally q2.stop()

    // one-shot reference: the unique frames through the same chain
    val unique = (1L to 8L).map(i => mkFrame(i, i * 1.5))
    chain(spark.read.schema("ts_ms LONG, frame STRING")
      .json(unique.toDS()), refStore)

    val got = WireIngest.readTradeStore(spark, store)
      .collect().map(_.toSeq).toSeq
    val want = WireIngest.readTradeStore(spark, refStore)
      .collect().map(_.toSeq).toSeq
    assert(got.size == 8)
    assert(got == want)
  }

  test("wire ingest: validation drops exactly the malformed variants") {
    // variants 3 (non-trade type), 4 (no code), 5 (no usable timestamp)
    // must be gone; 0/1/2/6 must all survive
    val surviving = WireIngest.qWireIngest(spark, Sf0001)
      .select(($"sequential_id" % 7).as("m")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(surviving == Seq(0L, 1L, 2L, 6L))
  }
}
