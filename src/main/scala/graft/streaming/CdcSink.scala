package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Streaming CDC apply face (X206 — productizes
 * [[graft.operators.Scale.mergeUpsert]] (X199) the way [[VectorSink]]
 * productized the IVF append and [[DayRouter]] the hypertable ingest:
 * the reference's idempotent DB sink, arch doc:1247-1307, carried to
 * UPDATE/DELETE semantics): a foreachBatch sink applying change
 * batches (op, k, prio, cents, seq) to the key-sharded store with
 * LATEST-WINS semantics — per key the change with the highest `seq`
 * (the CDC log position / commit LSN) is the one applied: 'D' deletes
 * the key, every other op upserts (update if present, insert
 * otherwise). Two sequential updates to one key inside a micro-batch
 * therefore apply the LATER value, exactly as replaying the log
 * row-by-row would. Equal-seq ties (a malformed log) collapse
 * deterministically: delete beats upsert, then smallest (prio, cents)
 * — so batch partitioning cannot change the outcome either way.
 * Ordering ACROSS batches is the stream's contract (CDC sources emit
 * in log order); the store keeps no seq column, so a batch replayed
 * out of order after a newer one would re-apply stale values — the
 * standard posture for versionless CDC appliers.
 *
 * Exactly-once rides IDEMPOTENCE, the same argument as the routers: a
 * redelivered batch collapses to the identical per-key latest change,
 * deletes already-absent keys (no-op) and re-writes identical rows —
 * replays are no-ops (spec-pinned byte-stable). Per-batch cost is
 * O(touched shards), never a table rewrite.
 */
class CdcSink(base: String) {
  import graft.operators.Relational.ColInterp

  /** Apply one change batch (op, k, prio, cents, seq). Safe to replay. */
  def apply(batch: DataFrame): Unit = {
    val latestFirst = Window.partitionBy($"k").orderBy($"seq".desc,
      when($"op" === "D", 0).otherwise(1), $"prio", $"cents")
    val latest = batch.select($"op", $"k", $"prio", $"cents", $"seq")
      .withColumn("rn", row_number().over(latestFirst))
      .filter($"rn" === 1).drop("rn")
    val deletes = latest.filter($"op" === "D").select($"k")
    val upserts = latest.filter($"op" =!= "D").select($"k", $"prio", $"cents")
    graft.operators.Scale.mergeUpsert(batch.sparkSession, base, deletes, upserts)
    ()
  }

  /** foreachBatch face for a streaming CDC query. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => apply(batch)
}
