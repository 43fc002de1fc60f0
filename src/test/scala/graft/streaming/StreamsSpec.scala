package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("slidingWindowAvg streaming equals the batch plan on the same data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (ts_ms, event_type, value) rows spanning several 5-min slides
    val base = 1700000000000L
    val rows = (0 until 200).map { i =>
      (base + i * 37000L, if (i % 3 == 0) "click" else "view", (i % 17) * 1.5)
    }
    val input = MemoryStream[(Long, String, Double)]
    val stream = Streams.slidingWindowAvg(
      input.toDF().select(timestamp_millis($"_1").as("ts"),
        $"_2".as("event_type"), $"_3".as("value")))
    val q = stream.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(120))
      q.processAllAvailable()
      input.addData(rows.drop(120))
      q.processAllAvailable()
      val got = spark.table("win_stream")
        .orderBy($"window_start_s", $"event_type").collect().toSeq
      val batch = Streams.slidingWindowAvg(
        rows.toDF("ts_ms", "event_type", "value")
          .select(timestamp_millis($"ts_ms").as("ts"), $"event_type", $"value"))
        .orderBy($"window_start_s", $"event_type").collect().toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("replaying the real events table as a stream matches the oracle-checked batch windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, graft.SparkSpec.Sf0001)
      .select(unix_millis($"ts").as("ts_ms"), $"event_type", $"value")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val input = MemoryStream[(Long, String, Double)]
    val q = Streams.slidingWindowAvg(
      input.toDF().select(timestamp_millis($"_1").as("ts"),
        $"_2".as("event_type"), $"_3".as("value")))
      .writeStream.format("memory").queryName("events_replay")
      .outputMode("complete").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("events_replay")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val batch = graft.operators.EventWindows
        .qSlidingWindow(spark, graft.SparkSpec.Sf0001)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("T6 policy: an event later than the watermark is dropped, not aggregated") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    val input = MemoryStream[(Long, String, Double)]
    val q = Streams.slidingWindowAvg(
      input.toDF().select(timestamp_millis($"_1").as("ts"),
        $"_2".as("event_type"), $"_3".as("value")))
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      // batch 1 advances the watermark far ahead
      input.addData(Seq((base, "click", 1.0), (base + 3600000L, "click", 2.0)))
      q.processAllAvailable()
      // batch 2: an event an hour behind the watermark — a missed
      // opportunity per the reference's no-late-data policy
      input.addData(Seq((base + 1000L, "click", 100.0)))
      q.processAllAvailable()
      // close all windows so append mode emits them
      input.addData(Seq((base + 7200000L, "click", 3.0)))
      q.processAllAvailable()
      val sums = spark.table("late_drop")
        .agg(sum($"sum_value")).head().getDouble(0)
      // the late 100.0 must not appear in any emitted window
      assert(sums < 100.0)
    } finally q.stop()
  }

  test("wordCounts in update mode emits per-update records like Flink keyed reduce") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = Streams.wordCounts(input.toDS())
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode("update").start()
    try {
      input.addData("to be or not to be")
      q.processAllAvailable()
      val after1 = spark.table("wc_stream").as[(String, Long)].collect().toMap
      assert(after1 == Map("to" -> 2L, "be" -> 2L, "or" -> 1L, "not" -> 1L))
      input.addData("be")
      q.processAllAvailable()
      // update mode: only the touched key re-emits, with its new total
      val emitted = spark.table("wc_stream").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      assert(emitted("be") == Seq(2L, 3L))
      assert(emitted("to") == Seq(2L))
    } finally q.stop()
  }

  test("idempotentAppend: replaying the same keys is a no-op") {
    import spark.implicits._
    val path = tmpDir("idem")
    val batch1 = Seq((1L, "a"), (1L, "a-dup"), (2L, "b")).toDF("id", "payload")
    Streams.idempotentAppend(batch1, Seq("id"), path)
    // replay with one overlapping and one new key
    val batch2 = Seq((2L, "b-replay"), (3L, "c")).toDF("id", "payload")
    Streams.idempotentAppend(batch2, Seq("id"), path)
    val stored = spark.read.parquet(path)
    assert(stored.count() == 3)
    assert(stored.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("idempotentAppend: an unreadable existing store fails loudly instead of duplicating") {
    import spark.implicits._
    val path = tmpDir("idem_corrupt")
    Streams.idempotentAppend(Seq((1L, "a")).toDF("id", "payload"), Seq("id"), path)
    // corrupt the store: truncate every parquet part file to garbage
    val dir = new java.io.File(path)
    dir.listFiles().filter(_.getName.startsWith("part-")).foreach { f =>
      java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
    }
    val replay = Seq((1L, "a-replay")).toDF("id", "payload")
    intercept[Exception] { Streams.idempotentAppend(replay, Seq("id"), path) }
    // nothing was appended: the corrupt part is still the only content
    assert(dir.listFiles().count(_.getName.startsWith("part-")) == 1)
  }

  test("routeByType: one partitioned write, each type independently readable") {
    import spark.implicits._
    val path = tmpDir("route")
    val batch = Seq((1L, "trade", 1.0), (2L, "orderbook", 2.0), (3L, "trade", 3.0))
      .toDF("id", "rec_type", "value")
    Streams.routeByType(batch, "rec_type", path)
    assert(spark.read.parquet(path + "/rec_type=trade").count() == 2)
    assert(spark.read.parquet(path + "/rec_type=orderbook").count() == 1)
  }

  test("kafka option maps mirror the reference producer/consumer profile") {
    val src = Streams.kafkaSourceOptions("broker:9092", Seq("upbit.trades.v1", "upbit.orderbooks.v1"))
    assert(src("subscribe") == "upbit.trades.v1,upbit.orderbooks.v1")
    val sink = Streams.kafkaSinkOptions("broker:9092", "upbit.trades.v1")
    assert(sink("kafka.compression.type") == "lz4")
    assert(sink("kafka.linger.ms") == "5")
    assert(sink("kafka.batch.size") == "16384")
    assert(sink("kafka.acks") == "all")
  }

  test("density signals: streaming across micro-batches equals the batch replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // synthetic: flat baseline of 100s then a crash to 10 for one user
    val base = 1700000000000L
    val rows = (0 until 30).map(i =>
      DensitySignals.DsEvent(5L, base + i * 60000L, i.toLong, 100.0)) :+
      DensitySignals.DsEvent(5L, base + 30 * 60000L, 30L, 10.0)
    val input = MemoryStream[DensitySignals.DsEvent]
    val q = DensitySignals.detectStream(input.toDS())
      .writeStream.format("memory").queryName("density_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(15))
      q.processAllAvailable()
      input.addData(rows.drop(15))
      q.processAllAvailable()
      val got = spark.table("density_stream").as[DensitySignals.Signal]
        .collect().sortBy(_.event_id).toSeq
      val expected = DensitySignals.runKey(5L,
        rows.sortBy(_.ts_ms).iterator.map(e => (e.ts_ms, e.event_id, e.value)))._2
      assert(got == expected)
      assert(got.map(_.event_id) == Seq(30L)) // only the crash event signals
      assert(got.head.baseline == 100.0)
    } finally q.stop()
  }
}
