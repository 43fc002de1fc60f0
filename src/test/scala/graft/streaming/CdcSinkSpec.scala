package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scale

/** Production contract of the streaming CDC apply face (X206, the
  * foreachBatch productization of X199's keyed MERGE): streamed change
  * batches leave the store equal to a driver-side sequential replay of
  * the same changes IN seq ORDER (latest-wins per key), redelivered
  * batches are byte-stable no-ops, and only touched shards ever
  * rewrite. */
class CdcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("cdc_sink").toString
    val base = s"$dir/store"
    (0L until 64L).map(k => (k, s"P${k % 3}", k * 100L + 7L))
      .toDF("k", "prio", "cents")
      .withColumn("shard", pmod($"k", lit(Scale.UpsertShards.toLong)))
      .repartition(Scale.UpsertShards, $"shard")
      .write.partitionBy("shard").parquet(s"$base/data")
    base
  }

  private def content(base: String): Map[Long, (String, Long)] =
    spark.read.parquet(s"$base/data")
      .select($"k", $"prio", $"cents")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("streamed CDC batches equal the sequential seq-order replay of the same changes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = freshStore()
    val sink = new CdcSink(base)
    // batch 1: delete 5, update 6; batch 2: insert 1001, re-update 6,
    // upsert-then-delete 7 in ONE batch (the later delete must win),
    // and TWO sequential updates to 8 in one batch (the later value —
    // seq 14's PB — must land, where a (prio, cents)-min collapse
    // would wrongly keep PA)
    val b1 = Seq(("D", 5L, "", 0L, 1L), ("U", 6L, "PX", 111L, 2L))
    val b2 = Seq(("I", 1001L, "PN", 42L, 10L), ("U", 6L, "PY", 222L, 11L),
      ("U", 7L, "PZ", 333L, 12L), ("D", 7L, "", 0L, 15L),
      ("U", 8L, "PA", 1L, 13L), ("U", 8L, "PB", 2L, 14L))
    val input = MemoryStream[(String, Long, String, Long, Long)]
    val q = input.toDF().toDF("op", "k", "prio", "cents", "seq")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc_ckpt").toString)
      .foreachBatch(sink.sink).start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // driver-side replay: apply every change row one at a time in seq
    // order — the ground truth the collapsed batch apply must equal
    val want = scala.collection.mutable.Map.empty[Long, (String, Long)]
    (0L until 64L).foreach(k => want(k) = (s"P${k % 3}", k * 100L + 7L))
    (b1 ++ b2).sortBy(_._5).foreach { case (op, k, p, c, _) =>
      if (op == "D") want.remove(k) else want(k) = (p, c)
    }
    // b2's 6 -> PY overwrote b1's PX; 7 deleted (seq 15 > 12); 8 -> PB
    assert(!want.contains(5L) && !want.contains(7L))
    assert(want(6L) == ("PY", 222L) && want(1001L) == ("PN", 42L))
    assert(want(8L) == ("PB", 2L), "later in-batch update must win")
    assert(content(base) == want.toMap)
  }

  test("redelivered change batches are byte-stable no-ops on untouched shards and value-stable everywhere") {
    val base = freshStore()
    val sink = new CdcSink(base)
    val batch = Seq(("D", 17L, "", 0L, 1L), ("U", 18L, "PX", 999L, 2L),
      ("I", 1003L, "PN", 42L, 3L)).toDF("op", "k", "prio", "cents", "seq")
    sink.apply(batch)
    val after1 = content(base)
    val conf = spark.sparkContext.hadoopConfiguration
    def snap(shard: Long) = {
      val p = new org.apache.hadoop.fs.Path(s"$base/data/shard=$shard")
      p.getFileSystem(conf).listStatus(p).toSeq
        .filter(_.isFile)
        .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
        .sortBy(_._1)
    }
    // batch keys 17, 18, 1003 hash to shards 1, 2 and 11
    val untouched = (0L until 16L).filterNot(Set(1L, 2L, 11L))
      .map(s => s -> snap(s)).toMap
    sink.apply(batch) // exact redelivery
    assert(content(base) == after1, "replay must not change the store")
    untouched.foreach { case (s, before) =>
      assert(snap(s) == before, s"shard $s rewritten by a replayed batch")
    }
  }
}
