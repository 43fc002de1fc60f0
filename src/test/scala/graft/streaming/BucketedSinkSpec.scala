package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scale

/** X160 streaming half: micro-batches land in the bucketed layout and
  * the table stays join-co-located — the sink is the productized
  * appendBucketedBatch, driven here through a real foreachBatch
  * stream. */
class BucketedSinkSpec extends SparkSpec {

  private val table = "g_sink_test"

  test("streamed micro-batches equal a one-shot write and keep the bucketed co-location") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dirF = new java.io.File(new java.net.URI(
      wh.stripSuffix("/") + "/" + table))
    if (dirF.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(dirF)
    }
    val rows = (0L until 90L).map(i => (i, s"p$i"))
    val input = MemoryStream[(Long, String)]
    val sink = new BucketedSink(table, "k")
    val q = input.toDF().toDF("k", "payload")
      .writeStream.foreachBatch(sink.writer)
      .outputMode("append").start()
    try {
      rows.grouped(30).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(table).orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == rows, "streamed content must equal the one-shot set")
    // layout: 3 batches -> at most 3 files per bucket; compaction folds
    // to exactly one and co-location holds
    Scale.compactBucketed(spark, table, "k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(table)
        .join(spark.table(table).select($"k", $"payload".as("p2")), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "streamed + compacted buckets must co-locate:\n" + plan)
      assert(j.count() == 90L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
