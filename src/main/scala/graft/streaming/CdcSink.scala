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
 * batches (op, k, prio, cents) to the key-sharded store — 'D' rows
 * delete their key, every other op upserts (update if present, insert
 * otherwise; delete beats upsert on the same key within a batch, the
 * X199 precedence).
 *
 * Exactly-once rides IDEMPOTENCE, the same argument as the routers: a
 * redelivered batch deletes already-absent keys (no-op), re-writes
 * updated rows to identical values and re-upserts identical rows — the
 * store is a pure function of the latest applied change per key, so
 * replays are no-ops (spec-pinned byte-stable). Multiple rows for one
 * key within a batch collapse deterministically ((prio, cents) order,
 * smallest wins) so batch partitioning cannot change the outcome.
 * Per-batch cost is O(touched shards), never a table rewrite.
 */
class CdcSink(base: String) {
  import graft.operators.Relational.ColInterp

  /** Apply one change batch (op, k, prio, cents). Safe to replay. */
  def apply(batch: DataFrame): Unit = {
    val deletes = batch.filter($"op" === "D").select($"k").distinct()
    val one = Window.partitionBy($"k").orderBy($"prio", $"cents")
    val upserts = batch.filter($"op" =!= "D")
      .select($"k", $"prio", $"cents")
      .withColumn("rn", row_number().over(one))
      .filter($"rn" === 1).drop("rn")
    graft.operators.Scale.mergeUpsert(batch.sparkSession, base, deletes, upserts)
    ()
  }

  /** foreachBatch face for a streaming CDC query. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => apply(batch)
}
