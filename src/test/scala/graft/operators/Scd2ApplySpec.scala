package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Production contract of incremental SCD2 maintenance (X209): an
  * apply leaves the sharded interval store equal to the full rebuild
  * over log ∪ batch, touches only the shards its changed keys hash to,
  * replays as byte-stable no-ops (watermark), and composes — two
  * sequential daily batches end at the same store as one combined
  * batch. */
class Scd2ApplySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000L

  private def logDf(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("o_custkey", "o_orderkey", "d_ms", "prio")

  /** 64 keys, 3 orders each over days 0-2; key k starts on priority
    * P(k%3) and keeps it — every key ends with one open interval. */
  private def baseLog: Seq[(Long, Long, Long, String)] =
    (0L until 64L).flatMap(k =>
      (0L until 3L).map(i => (k, k * 10 + i, i * Day, s"P${k % 3}")))

  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("scd2_store").toString
    val base = s"$dir/store"
    Temporal.scd2InitStore(spark, base, logDf(baseLog))
    base
  }

  private def content(base: String): Set[(Long, Long, String, Long, Option[Long], Long, Int)] =
    spark.read.parquet(s"$base/data")
      .select($"c_custkey", $"version", $"prio", $"valid_from_ms",
        $"valid_to_ms", $"n_orders", $"is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getInt(6))).toSet

  private def rebuilt(log: Seq[(Long, Long, Long, String)]) =
    Temporal.scd2Intervals(logDf(log))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getInt(6))).toSet

  private def snap(base: String, shard: Long) = {
    val p = new org.apache.hadoop.fs.Path(s"$base/data/shard=$shard")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).toSeq.filter(_.isFile)
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .sortBy(_._1)
  }

  // batch over days 10-12: key 17 same-prio (extends its open
  // interval), key 18 new prio (closes + appends), key 19 a 3-island
  // zigzag in ONE batch, key 20 same-prio twice THEN a change (extend
  // then close), key 1003 brand-new (insert-only keys hash to shard 11
  // — exercises the no-existing-row path)
  private def tailBatch: Seq[(Long, Long, Long, String)] = Seq(
    (17L, 900L, 10 * Day, "P2"), // 17 % 3 = 2 → merge
    (18L, 901L, 10 * Day, "PX"),
    (19L, 902L, 10 * Day, "PA"), (19L, 903L, 11 * Day, "PB"),
    (19L, 904L, 12 * Day, "PA"),
    (20L, 905L, 10 * Day, "P2"), (20L, 906L, 11 * Day, "P2"),
    (20L, 907L, 12 * Day, "PQ"),
    (1003L, 908L, 10 * Day, "PN"))

  test("apply equals the full rebuild over log union batch, touching only changed-key shards") {
    val base = freshStore()
    // changed keys 17, 18, 19, 20, 1003 → shards 1, 2, 3, 4, 11
    val untouchedShards = (0L until 16L)
      .filterNot(Set(1L, 2L, 3L, 4L, 11L)).map(s => s -> snap(base, s)).toMap
    val touched = Temporal.scd2Apply(spark, base, logDf(tailBatch))
    assert(touched == 5L, s"expected 5 touched shards, got $touched")
    assert(content(base) == rebuilt(baseLog ++ tailBatch))
    untouchedShards.foreach { case (s, before) =>
      assert(snap(base, s) == before, s"shard $s rewritten by the apply")
    }
  }

  test("a redelivered batch is a zero-shard byte-stable no-op") {
    val base = freshStore()
    Temporal.scd2Apply(spark, base, logDf(tailBatch))
    val after1 = content(base)
    val all = (0L until 16L).map(s => s -> snap(base, s)).toMap
    val touched = Temporal.scd2Apply(spark, base, logDf(tailBatch))
    assert(touched == 0L, "watermark must filter the whole replay")
    assert(content(base) == after1)
    all.foreach { case (s, before) =>
      assert(snap(base, s) == before, s"shard $s rewritten by a replay")
    }
  }

  test("two sequential daily batches equal the one-shot combined apply") {
    val (d1, d2) = tailBatch.partition(_._3 <= 10 * Day)
    val seqBase = freshStore()
    Temporal.scd2Apply(spark, seqBase, logDf(d1))
    Temporal.scd2Apply(spark, seqBase, logDf(d2))
    assert(content(seqBase) == rebuilt(baseLog ++ tailBatch))
    // the day-2 zigzag tail of key 19 must have opened versions on top
    // of the day-1 apply, not rebuilt them
    val k19 = content(seqBase).filter(_._1 == 19L)
    assert(k19.count(_._7 == 1) == 1 && k19.size == 4,
      s"key 19 must end with 4 versions, one open: $k19")
  }
}
