package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scale

/** Production contract of the HRW shard router (X135 wiring): streamed
  * routing equals one-shot assignment, redelivery is a no-op, and the
  * on-disk layout is the shard-partitioned store consumers read. */
class ShardRouterSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map(i => (i.toLong, s"doc text $i"))

  test("streamed batches equal one-shot assignment; layout is shard-partitioned") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("shard_router").toString
    val store = s"$dir/store"
    val router = new ShardRouter(store)
    val all = docs(0 until 200)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(router.sink).start()
    try {
      all.grouped(70).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val stored = spark.read.parquet(store)
    assert(stored.count() == all.size)
    // every stored shard equals the deterministic HRW assignment
    val bad = stored.withColumn("want",
      Scale.rendezvousShard($"doc_id", Scale.HrwShards))
      .filter($"shard" =!= $"want")
    assert(bad.isEmpty)
    // the layout is a real partitioned store: shard=K directories
    val dirs = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=\\d+")))
  }

  test("redelivered batches are no-ops: replays cannot duplicate the store") {
    val dir = java.nio.file.Files.createTempDirectory("shard_router2").toString
    val store = s"$dir/store"
    val router = new ShardRouter(store)
    val b1 = docs(0 until 50).toDF("doc_id", "text")
    val b2 = docs(30 until 80).toDF("doc_id", "text") // overlaps b1
    router.route(b1)
    router.route(b1) // exact redelivery
    router.route(b2) // partial overlap (at-least-once delivery)
    val stored = spark.read.parquet(store)
    assert(stored.count() == 80)
    assert(stored.groupBy($"doc_id").count().filter($"count" =!= 1).isEmpty)
  }
}
