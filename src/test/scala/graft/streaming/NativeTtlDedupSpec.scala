package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.IdempotentDedup.SignalRow

/** Flag-gated probe of the Spark-4-native TTL path (see the
  * environment note in [[NativeTtlDedup]]): export `GRAFT_NATIVE_TTL=1`
  * to run. In this sandbox the RocksDB provider stalls the first
  * micro-batch, so the default run cancels rather than hangs; re-try
  * each round — a green run is the signal to migrate T5. Retried
  * rounds 4, 5, 6, 7, 8, 9, 10 (twice), 11, 12, 13: still stalls
  * (rounds 7-13: 300-540 s timeout, flag on, first micro-batch never
  * completes; last retried 2026-08-15, round 13, 540 s). The
  * built-in dropDuplicatesWithinWatermark path (test above) is green
  * on the default store and covers the within-watermark case
  * natively. */
class NativeTtlDedupSpec extends SparkSpec {

  test("native dropDuplicatesWithinWatermark: engine-managed dedup state on the default store") {
    // the OTHER Spark-4-native dedup path — declarative, no user state
    // code, and it runs green on the default state store where the
    // RocksDB transformWithState path stalls (test below)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SignalRow]
    val q = IdempotentDedup.dedupStreamNative(input.toDS(), delay = "30 seconds")
      .writeStream.format("memory").queryName("native_wm_dedup")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        SignalRow("sig-a", "KRW-BTC", 1000L, 1.0),
        SignalRow("sig-b", "KRW-BTC", 2000L, 2.0)))
      q.processAllAvailable()
      // same ids again, later event times, a later batch: dropped
      input.addData(Seq(
        SignalRow("sig-a", "KRW-BTC", 5000L, 9.0),
        SignalRow("sig-c", "KRW-BTC", 6000L, 3.0)))
      q.processAllAvailable()
      val got = spark.table("native_wm_dedup").as[SignalRow]
        .collect().map(r => (r.signal_id, r.ts_ms)).sorted.toSeq
      assert(got == Seq(("sig-a", 1000L), ("sig-b", 2000L), ("sig-c", 6000L)),
        "first arrival wins; within-delay duplicates never emit")
    } finally q.stop()
  }

  test("native transformWithState TTL dedup: first-seen wins within the TTL") {
    assume(sys.env.get("GRAFT_NATIVE_TTL").contains("1"),
      "native RocksDB path stalls in this environment; export GRAFT_NATIVE_TTL=1 to retry")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SignalRow]
    val q = NativeTtlDedup.dedupStream(input.toDS(), ttlMs = 60000L)
      .writeStream.format("memory").queryName("native_ttl_dedup")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        SignalRow("sig-a", "KRW-BTC", 2L, 1.0),
        SignalRow("sig-a", "KRW-BTC", 1L, 1.0),
        SignalRow("sig-b", "KRW-BTC", 3L, 1.0)))
      q.processAllAvailable()
      input.addData(Seq(SignalRow("sig-a", "KRW-BTC", 4L, 1.0))) // within TTL: dropped
      q.processAllAvailable()
      val got = spark.table("native_ttl_dedup").as[SignalRow]
        .collect().map(r => (r.signal_id, r.ts_ms)).sorted.toSeq
      assert(got == Seq(("sig-a", 1L), ("sig-b", 3L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
