package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

import graft.operators.{Clustering, Dedup}

/**
 * Production wiring of the incremental cluster-label merge (X125): a
 * mutable (signature store, label store) pair maintained across
 * micro-batches — each incoming (doc_id, text) batch is signed, its
 * new near-dup edges merged into the persisted labels
 * ([[Clustering.mergeIncrementalLabels]]), and its signatures absorbed
 * into the band index the NEXT batch probes. This is the loop the
 * batch-split invariance spec replays (ReplayEquivalenceSpec drives
 * this class; stream-maintained labels ≡ the from-scratch closure).
 *
 * Both stores are LINEAGE-SAFE for long-running streams: a naive
 * `union`/join per batch nests the logical plan one level per
 * micro-batch (the plan-growth failure the label-propagation loop hit
 * at 10×, SCALING.md modal note), and a CacheManager persist keeps a
 * lineage that reaches back into micro-batch frames that no longer
 * exist. Each absorption therefore re-wraps both stores' rows in
 * fresh flat DataFrames over RDDs persisted at the RDD level
 * (MEMORY_AND_DISK: spill, not evict), releasing the previous round's
 * blocks deterministically via `RDD.unpersist` — plan depth stays
 * O(1) no matter how many batches the stream runs, exactly the
 * `connectedComponents` loop discipline.
 */
class LabelMaintenance(initialDocs: DataFrame) {

  private val spark = initialDocs.sparkSession

  /** Flat materialized copy: rows persisted at the RDD level, wrapped
    * in a fresh O(1)-depth DataFrame. */
  private def flatten(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rows = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val flat = spark.createDataFrame(rows, df.schema)
    flat.count() // materialize before any upstream blocks are released
    (flat, rows)
  }

  private var (sigStore, sigRows) =
    flatten(Dedup.signatureFrame(initialDocs.select("doc_id", "text")))

  private var (labelStore, labelRows) = {
    val closed = Clustering.connectedComponents(
      Dedup.edgesOf(sigStore, sigStore.limit(0)))
    val f = flatten(closed)
    closed.unpersist() // the flat RDD now owns the rows
    f
  }

  /** Current (id, label) store — every clustered doc seen so far. */
  def labels: DataFrame = synchronized(labelStore)

  /** Current (doc_id, sh, sig) band-index store. */
  def signatures: DataFrame = synchronized(sigStore)

  /** Merge one incoming (doc_id, text) batch; returns the post-merge
    * label store. Batch doc_ids must be new (exact-id dedup runs
    * upstream — the ingestion contract). */
  def absorb(batchDocs: DataFrame): DataFrame = synchronized {
    val sig = Dedup.signatureFrame(batchDocs.select("doc_id", "text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val (merged, releaseClosure) =
      Clustering.mergeIncrementalLabelsReleasable(sig, sigStore, labelStore)
    val (mergedFlat, mergedRows) = flatten(merged)
    // flatten() counted the merged rows, so the contracted-closure
    // blocks behind them are released HERE, per batch — not deferred to
    // a registry an unbounded stream would never drain.
    releaseClosure()
    labelRows.unpersist()
    labelStore = mergedFlat
    labelRows = mergedRows
    val (grownFlat, grownRows) = flatten(sigStore.unionByName(sig))
    sigRows.unpersist()
    sig.unpersist()
    sigStore = grownFlat
    sigRows = grownRows
    labelStore
  }

  /** Retract a document (takedown / opt-out / license expiry) from both
    * stores: its signatures leave the band index, and if it was
    * CLUSTERED its component is re-closed over the survivors only
    * ([[Clustering.retractFromLabels]] — the X128 semantics: removal is
    * indistinguishable from the doc never having existed). Retracting
    * an unclustered or unseen doc only trims the signature store. */
  def retract(docId: Long): DataFrame = synchronized {
    import org.apache.spark.sql.functions.col // not ._ — it shadows flatten()
    val hit = labelStore.filter(col("id") === docId)
      .select("label").collect() // ≤1 row: bounded model read
    if (hit.nonEmpty) {
      val label = hit.head.getLong(0)
      // survivors of the doc's component, re-paired from their stored
      // signatures: one banded self-join over |component| rows
      val members = labelStore
        .filter(col("label") === label && col("id") =!= docId)
        .select(col("id").as("doc_id"))
      val memberSigs = sigStore.join(members, Seq("doc_id"))
      val survivorPairs = Dedup.edgesOf(memberSigs, memberSigs.limit(0))
      // splice: drop the doc's row, replace its component (keyed by the
      // component label — docId need not be the representative) with
      // the survivor sub-closure
      val (relabeled, releaseClosure) = Clustering.retractFromLabelsReleasable(
        labelStore.filter(col("id") =!= docId), label, survivorPairs)
      val (flatL, rowsL) = flatten(relabeled)
      releaseClosure()
      labelRows.unpersist()
      labelStore = flatL
      labelRows = rowsL
    }
    val (flatS, rowsS) = flatten(sigStore.filter(col("doc_id") =!= docId))
    sigRows.unpersist()
    sigStore = flatS
    sigRows = rowsS
    labelStore
  }

  /** foreachBatch face for a streaming ingestion query. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => { absorb(batch); () }

  /** Release both stores' blocks. */
  def close(): Unit = synchronized {
    sigRows.unpersist()
    labelRows.unpersist()
  }
}
