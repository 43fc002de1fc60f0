package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Scale

/**
 * Streaming ingestion INTO the bucketed layout (X160): a foreachBatch
 * sink appending each micro-batch to a bucketed table with a stable
 * bucket spec ([[Scale.appendBucketedBatch]]), so the table every
 * batch lands in keeps joining its bucketed peers with zero exchanges
 * — the streaming half of the X149/X154 layout story. File growth is
 * batches·buckets; [[Scale.compactBucketed]] folds it back to one
 * file per bucket whenever the small-file count matters.
 *
 * Delivery contract: foreachBatch may redeliver a batch on recovery;
 * this sink appends blind, so exactly-once needs either upstream
 * dedup ([[IdempotentDedup]]) or downstream idempotent consumption —
 * same stance as the reference's idempotent-store chain (WireIngest),
 * which owns the batchId bookkeeping variant. The replay spec drives
 * absorb() directly with redelivered-free chunks and pins
 * streamed-content ≡ one-shot-write equality plus the co-located
 * join plan.
 */
final class BucketedSink(table: String, key: String) {

  /** One micro-batch: append under the stable bucket spec. */
  def absorb(batch: DataFrame): Unit =
    Scale.appendBucketedBatch(batch, key, table)

  /** Adapter for `writeStream.foreachBatch`. */
  def writer: (DataFrame, Long) => Unit = (df, _) => absorb(df)
}
