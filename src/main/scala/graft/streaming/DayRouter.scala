package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Date-partitioning ingest face (reference: the TimescaleDB hypertable
 * intent, arch doc:2111 — `create_hypertable('raw_trades',
 * 'trade_timestamp')`): a foreachBatch router that lands each incoming
 * event in its `day=` partition of a date-partitioned parquet store,
 * the layout that lets every time-bounded query prune to the days it
 * actually reads ([[graft.operators.Scale.qTimePrune]], X161).
 *
 * Spark is the hypertable here: the chunk-per-time-interval structure
 * TimescaleDB builds inside postgres is directory-partitioned parquet,
 * and chunk exclusion is Catalyst partition pruning — PartitionFilters
 * on the day column, machine-pinned in PlanSpec.
 *
 * Scale stance mirrors [[ShardRouter]] (the two are the same
 * [[PartitionedAppend]] primitive with different partition functions):
 *  - day assignment is per-row codegen'd arithmetic, zero shuffle;
 *  - replays anti-join only the day partitions the batch touches
 *    (bounded by the batch's time span, never the store's);
 *  - exactly-once rides the deterministic event_id key.
 */
class DayRouter(path: String) {

  /** Route one event batch (event_id, ts, user_id, event_type, value)
    * into the store. Safe to replay. */
  def route(batch: DataFrame): Unit = {
    val assigned = batch
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
      .dropDuplicates("event_id")
    PartitionedAppend.append(assigned, path, "day", "event_id")
  }

  /** foreachBatch face for a streaming ingestion query. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => { route(batch); () }
}
