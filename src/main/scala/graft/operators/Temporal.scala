package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Temporal joins — the two join shapes a market-data engine needs that
 * plain equi-joins can't express (reference analogue: matching trade
 * feedback to the most recent signal, PositionTracker's stale-feedback
 * guard at position_tracker.py's 추후 과제.md:59-219, and the
 * "errors in the trailing window before a trade" diagnostics shape of
 * the density baseline, arch doc:642-647).
 *
 * Both are built scale-first:
 *
 *  - As-of join: the naive encoding (inequality join + row_number)
 *    materializes every (probe, candidate-past-row) pair before picking
 *    one — quadratic blowup per key at 100 TB. This implementation uses
 *    the union trick instead: tag both sides, ONE shuffle on the key,
 *    one sort, and a running `last(_, ignoreNulls)` carries the most
 *    recent right-side row forward. Cost is sort-merge of |L|+|R| rows
 *    — the same plan shape Spark uses for any window function, with no
 *    pair explosion ever.
 *
 *  - Range join: the naive inequality join is a per-key cartesian that
 *    Spark plans as BroadcastNestedLoopJoin — quadratic. This
 *    implementation buckets time by the window length: each right row
 *    is emitted into its own bucket and the next (2 copies total), each
 *    probe looks up exactly one bucket, and the equi-join on
 *    (key, bucket) collides only rows within one window length of each
 *    other before the exact range filter. Shuffle volume is 2|R|+|L|
 *    slim rows; the join is a plain shuffled hash join that AQE can
 *    re-plan — this is the shape that survives 100 TB.
 */
object Temporal {
  import Relational.ColInterp

  private val DEC = DecimalType(18, 6)

  // ------------------------------------------------------------------
  // As-of join: for each purchase, the most recent click of the same
  // user at-or-before the purchase (point-in-time enrichment). The
  // right side is first reduced to one row per (user, ts) so the
  // "latest at-or-before" pick is unique and deterministic.
  // ------------------------------------------------------------------
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"value")
      .groupBy($"user_id", $"ts_ms")
      .agg(max($"value").as("c_val"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value")

    // Union trick: side 0 = click (state carrier), side 1 = purchase
    // (probe). Sorting by (ts, side) puts a click at the same ms BEFORE
    // the purchase, implementing at-or-before (>=) semantics.
    val tagged = clicks
      .select($"user_id", $"ts_ms", lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        $"ts_ms".as("c_ts"), $"c_val")
      .unionByName(purchases
        .select($"user_id", $"ts_ms", lit(1).as("side"), $"event_id", $"value",
          lit(null).cast("long").as("c_ts"), lit(null).cast("double").as("c_val")))

    val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_ts_ms", last($"c_ts", ignoreNulls = true).over(w))
      .withColumn("click_value", last($"c_val", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"user_id", $"ts_ms", $"event_id", $"value", $"click_ts_ms", $"click_value")
      .orderBy($"user_id", $"ts_ms", $"event_id")
  }

  /** Oracle: DuckDB's native ASOF LEFT JOIN (largest right ts ≤ probe
    * ts per key) — an independent implementation of the same semantic,
    * so agreement pins the union-trick encoding exactly. */
  val sqlAsofJoin: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS c_ts, max(value) AS c_val
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |purch AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.ts_ms, p.event_id, p.value,
      |  c.c_ts AS click_ts_ms, c.c_val AS click_value
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts_ms >= c.c_ts
      |ORDER BY p.user_id, p.ts_ms, p.event_id""".stripMargin

  // ------------------------------------------------------------------
  // Range join: per purchase, aggregate the errors of the same user in
  // the trailing 6-hour window [ts - 6h, ts). Bucketed as described
  // above; WindowMs doubles as the bucket width so every trailing
  // window spans at most 2 buckets.
  // ------------------------------------------------------------------
  val WindowMs = 21600000L // 6 hours

  private def bucketOf(tsMs: Column): Column = floor(tsMs / WindowMs).cast("long")

  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value")
      .withColumn("bkt", bucketOf($"ts_ms"))
    // Each error lands in its own bucket and the next one, so any probe
    // whose trailing window covers it shares a bucket with one copy.
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", unix_millis($"ts").as("e_ts"), $"value".as("e_val"))
      .withColumn("bkt", explode(array(bucketOf($"e_ts"), bucketOf($"e_ts") + 1)))
    val p = purchases.as("p")
    val e = errors.as("e")
    p.join(e,
        col("p.user_id") === col("e.user_id") && col("p.bkt") === col("e.bkt") &&
        col("e.e_ts") >= col("p.ts_ms") - WindowMs && col("e.e_ts") < col("p.ts_ms"),
        "left")
      .groupBy(col("p.user_id").as("user_id"), col("p.ts_ms").as("ts_ms"),
        col("p.event_id").as("event_id"), col("p.value").as("value"))
      .agg(count(col("e.e_ts")).as("n_errors"),
        coalesce(sum(col("e.e_val").cast(DEC)).cast("double"), lit(0.0)).as("err_value"))
      .orderBy($"user_id", $"ts_ms", $"event_id")
  }

  /** Oracle: the naive inequality join (fine at sf0.01) — the bucketed
    * plan must produce identical aggregates. */
  val sqlRangeJoin: String =
    s"""WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
       |  FROM events WHERE event_type = 'purchase'),
       |e AS (SELECT user_id, epoch_ms(ts) AS e_ts, value AS e_val
       |  FROM events WHERE event_type = 'error')
       |SELECT p.user_id, p.ts_ms, p.event_id, p.value,
       |  count(e.e_ts) AS n_errors,
       |  coalesce(CAST(sum(CAST(e.e_val AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS err_value
       |FROM p LEFT JOIN e ON e.user_id = p.user_id
       |  AND e.e_ts >= p.ts_ms - $WindowMs AND e.e_ts < p.ts_ms
       |GROUP BY 1, 2, 3, 4
       |ORDER BY 1, 2, 3""".stripMargin
}
