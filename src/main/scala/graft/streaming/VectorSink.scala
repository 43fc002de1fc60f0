package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Streaming vector-ingest face for the persisted IVF artifact (X180 —
 * X165's batch append productized as a sink, the [[DayRouter]]/
 * [[ShardRouter]] pattern on the `cell` partition column): a
 * foreachBatch router that assigns each arriving vector to its frozen
 * centroid cell ([[graft.operators.Similarity.assignCells]] — the SAME
 * assignment the corpus builders use, so streamed placement can never
 * drift from a rebuild) and idempotent-appends it into the inverted
 * file's `cell=` directories through the shared [[PartitionedAppend]]
 * primitive.
 *
 * Scale stance (the router contract):
 *  - cell assignment is a broadcast join against the ≤ |centroids|
 *    frame + one batch-keyed ranking window — zero corpus shuffle;
 *  - replays anti-join ONLY the cell partitions the batch touches
 *    (bounded by |centroids|, never the store), so redelivery is a
 *    no-op at any store size;
 *  - exactly-once rides the deterministic vec_id key;
 *  - the serving path ([[graft.operators.Similarity.probeArtifact]])
 *    is unchanged and stays partition-pruned after every ingest
 *    (ReplayEquivalenceSpec pins streamed ≡ one-shot build and the
 *    post-ingest probe's PartitionFilters).
 */
class VectorSink(base: String) {

  /** Route one (vec_id, v) vector batch into the inverted file.
    * Safe to replay. */
  def route(batch: DataFrame): Unit = {
    val assigned = graft.operators.Similarity.assignCells(
      batch.dropDuplicates("vec_id"))
    PartitionedAppend.append(assigned, s"$base/inverted", "cell", "vec_id")
  }

  /** foreachBatch face for a streaming ingestion query. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => { route(batch); () }
}
