package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Production contract of the date-partitioning ingest face (X161
  * wiring — the hypertable intent): streamed routing equals a one-shot
  * day assignment, redelivery is a no-op, and the on-disk layout is the
  * day-partitioned store the pruned time-range queries read. */
class DayRouterSpec extends SparkSpec {
  import spark.implicits._

  private def events(dir: String) =
    Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")

  test("streamed batches equal one-shot day assignment; layout is day-partitioned") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("day_router").toString
    val store = s"$dir/store"
    val router = new DayRouter(store)
    val all = events(graft.SparkSpec.Sf0001)
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val q = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(router.sink).start()
    try {
      all.grouped(all.size / 3 + 1).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val stored = spark.read.parquet(store)
    assert(stored.count() == all.size)
    // every stored day equals the deterministic epoch-day derivation
    val bad = stored
      .withColumn("want", expr("unix_millis(ts) div 86400000"))
      .filter($"day".cast("long") =!= $"want")
    assert(bad.isEmpty)
    // the layout is a real partitioned store: day=K directories
    val dirs = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("day="))
    assert(dirs.length >= 28 && dirs.forall(_.matches("day=\\d+")))
  }

  test("end to end: a stream-ingested store serves the pruned time-range rollup identically") {
    import graft.operators.{Relational, Scale}
    val dir = java.nio.file.Files.createTempDirectory("day_router3").toString
    val store = s"$dir/store"
    val router = new DayRouter(store)
    // three at-least-once batches (the middle one redelivered)
    val ev = events(graft.SparkSpec.Sf0001)
    router.route(ev.filter($"event_id" % 3 === 0))
    router.route(ev.filter($"event_id" % 3 === 1))
    router.route(ev.filter($"event_id" % 3 === 1)) // redelivery
    router.route(ev.filter($"event_id" % 3 === 2))
    // the X161 rollup over the STREAM-built store
    def rollup(path: String) = spark.read.parquet(path)
      .filter($"day" >= Scale.PruneDayLo && $"day" <= Scale.PruneDayHi)
      .groupBy($"day".cast("long").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"), Relational.dsum($"value").as("sum_value"))
      .orderBy($"day", $"event_type")
      .collect().toSeq
    val batchStore = Scale.dayPartitionedEvents(spark, graft.SparkSpec.Sf0001)
    assert(rollup(store) == rollup(batchStore),
      "stream-ingested and batch-built day stores must serve identical rollups")
    // and the pruned scan over the streamed store still partition-prunes
    val plan = spark.read.parquet(store)
      .filter($"day" >= Scale.PruneDayLo && $"day" <= Scale.PruneDayHi)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains(Scale.PruneDayLo.toString))
  }

  test("redelivered batches are no-ops: replays cannot duplicate the store") {
    val dir = java.nio.file.Files.createTempDirectory("day_router2").toString
    val store = s"$dir/store"
    val router = new DayRouter(store)
    val ev = events(graft.SparkSpec.Sf0001)
    val b1 = ev.filter($"event_id" < 50)
    val b2 = ev.filter($"event_id" >= 30 && $"event_id" < 80) // overlaps b1
    router.route(b1)
    router.route(b1) // exact redelivery
    router.route(b2) // partial overlap (at-least-once delivery)
    val stored = spark.read.parquet(store)
    assert(stored.count() == 80)
    assert(stored.groupBy($"event_id").count().filter($"count" =!= 1).isEmpty)
  }
}
