package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked STREAM-STREAM interval join — the join class the
 * reference's keyed connect (J1, position_tracker) hand-builds with
 * MapState buffers, expressed as Structured Streaming's native
 * stream-stream join: both sides buffer in the state store, the time
 * bound in the join condition plus the watermarks let Spark EVICT
 * buffered rows once they can no longer match, so state is bounded by
 * the interval width (not the stream length) — the property that
 * keeps a 100 TB/day join from accumulating unbounded state.
 *
 * Semantics: each purchase joins every click of the same user in the
 * trailing [purchase − window, purchase] interval — the stream twin of
 * the batch range join ([[graft.operators.Temporal.qRangeJoin]]'s
 * family); stream ≡ batch is pinned in ReplayEquivalenceSpec.
 */
object IntervalJoin {

  val WindowS = 21600L // 6 hours, the Temporal.WindowMs convention

  /** Join two streaming (user_id, event_id, ts_s, value) frames:
    * clicks within the trailing window of each purchase. */
  def clicksBeforePurchases(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_s").as("c_ts"), col("value").as("click_value"))
      .withColumn("c_time", timestamp_seconds(col("c_ts")))
      .withWatermark("c_time", "0 seconds")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_s").as("p_ts"), col("value").as("purchase_value"))
      .withColumn("p_time", timestamp_seconds(col("p_ts")))
      .withWatermark("p_time", s"$WindowS seconds")
    c.join(p,
        expr(s"""c_user = p_user AND
                 c_time >= p_time - INTERVAL $WindowS SECONDS AND
                 c_time <= p_time"""))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("click_value"))
  }

  /** LEFT OUTER variant: every purchase emits, unmatched ones with
    * NULL click columns — but only once the watermark proves no
    * in-window click can still arrive (Spark holds the unmatched row
    * in state until then; the null-completion is watermark-DRIVEN,
    * which is exactly the correctness property the inner join doesn't
    * need and hand-rolled buffers get wrong). State stays bounded by
    * the interval width on both sides. */
  def purchasesWithClicks(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_s").as("c_ts"), col("value").as("click_value"))
      .withColumn("c_time", timestamp_seconds(col("c_ts")))
      .withWatermark("c_time", "0 seconds")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_s").as("p_ts"), col("value").as("purchase_value"))
      .withColumn("p_time", timestamp_seconds(col("p_ts")))
      .withWatermark("p_time", s"$WindowS seconds")
    p.join(c,
        expr(s"""c_user = p_user AND
                 c_time >= p_time - INTERVAL $WindowS SECONDS AND
                 c_time <= p_time"""),
        "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("click_value"))
  }
}
