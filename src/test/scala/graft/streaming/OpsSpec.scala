package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.{Formats, Tables}

/** Format round-trips, metrics listener, and live-config reload. */
class OpsSpec extends SparkSpec {

  private def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  test("region table round-trips through JSON and CSV with explicit schemas") {
    import spark.implicits._
    val region = Tables.region(spark, graft.SparkSpec.Sf0001)
    val schema = region.schema
    val jsonPath = tmp("fmt_json")
    val csvPath = tmp("fmt_csv")
    Formats.writeJson(region, jsonPath)
    Formats.writeCsv(region, csvPath)
    val viaJson = Formats.readJson(spark, schema, jsonPath)
      .orderBy($"r_regionkey").collect().toSeq
    val viaCsv = Formats.readCsv(spark, schema, csvPath)
      .orderBy($"r_regionkey").collect().toSeq
    val original = region.orderBy($"r_regionkey").collect().toSeq
    assert(viaJson == original && viaCsv == original)
  }

  test("streaming JSON-lines source feeds the same transforms as batch") {
    import spark.implicits._
    val dir = tmp("fmt_stream")
    val schema = StructType(Seq(
      StructField("code", StringType), StructField("value", DoubleType)))
    Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      """{"code":"KRW-BTC","value":1.5}
        |{"code":"KRW-ETH","value":2.5}""".stripMargin)
    val q = Formats.streamJson(spark, schema, dir)
      .groupBy($"code").agg(sum($"value").as("total"))
      .writeStream.format("memory").queryName("json_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("json_stream").as[(String, Double)].collect().toMap
      assert(got == Map("KRW-BTC" -> 1.5, "KRW-ETH" -> 2.5))
    } finally q.stop()
  }

  test("QueryMetricsListener accumulates batches, input rows, and state rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new QueryMetricsListener
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[String]
      val q = Streams.wordCounts(input.toDS())
        .writeStream.format("memory").queryName("metrics_wc")
        .outputMode("update").start()
      try {
        input.addData("a b c"); q.processAllAvailable()
        input.addData("a"); q.processAllAvailable()
        // listener delivery is async; poll briefly
        val deadline = System.currentTimeMillis() + 10000
        var m = listener.metricsFor("metrics_wc")
        while (System.currentTimeMillis() < deadline &&
               !m.exists(t => t.inputRows >= 2 && t.batches >= 2)) {
          Thread.sleep(100); m = listener.metricsFor("metrics_wc")
        }
        val totals = m.get
        assert(totals.batches >= 2)
        assert(totals.inputRows == 2)      // two addData calls = two input rows
        assert(totals.stateRows == 3L)     // distinct words a, b, c in state
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("live config: a threshold edit is visible at the next micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val confPath = tmp("cfg") + "/engine.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), "min.value=10\n")
    val passed = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val input = MemoryStream[Double]
    val q = ConfigBroadcast.withLiveConfig(input.toDF(), confPath) { (batch, cfg) =>
      val threshold = cfg.double("min.value", 0.0)
      batch.filter(col("value") >= threshold).collect()
        .foreach(r => passed.add(r.getDouble(0)))
    }.start()
    try {
      input.addData(Seq(5.0, 15.0)); q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(confPath), "min.value=1\n")
      input.addData(Seq(5.0, 15.0)); q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(passed.asScala.toSeq.sorted == Seq(5.0, 15.0, 15.0))
    } finally q.stop()
  }
}
