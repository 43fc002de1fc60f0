package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Sketch-based approximate aggregation — the operators that replace
 * their exact twins at 100 TB, where exact distinct counting
 * ([[Analytics.qQuantiles]]-style order statistics, COUNT(DISTINCT))
 * would shuffle the full key set. HyperLogLog++ distinct counts and
 * relative-error quantile sketches aggregate in fixed memory per
 * partition and merge associatively — the shuffle carries one sketch
 * per partition, independent of cardinality.
 *
 * Gate design: sketch *internals* are engine-specific (Spark HLL++ vs
 * DuckDB's HLL differ bit-wise by construction), so the oracle checks
 * the CONTRACT instead — exact values computed identically on both
 * engines, plus error-bound booleans that Spark evaluates against its
 * own sketches (deterministic for fixed input) and the oracle pins as
 * literal TRUE. A sketch drifting out of tolerance flips the boolean
 * and fails the row hash.
 */
object Sketches {
  import Relational.ColInterp

  /** Relative-error tolerance for HLL++ (default rsd = 0.05) and the
    * approx-percentile rank error (accuracy 10000 ⇒ 1e-4 rank error —
    * we allow the observed value to sit within ±2 % of the exact
    * order-statistic's rank neighborhood via a value-window check). */
  val HllRsd = 0.05
  val PctAccuracy = 10000

  def qSketchStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select($"event_type", $"user_id", $"value", $"event_id")
    // Exact references (order statistics, same formulation as the
    // oracle): p50/p99 per type + exact distinct users.
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val ranked = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
    def orderStat(q: Double) =
      min(when($"rn" >= ceil(lit(q) * $"n").cast("long"), $"value"))
    val exact = ranked.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("exact_users"),
        orderStat(0.5).as("p50_exact"),
        orderStat(0.99).as("p99_exact"))
    // Sketched versions: fixed-memory, merge-associative.
    val approx = ev.groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", HllRsd).as("hll_users"),
        percentile_approx($"value", array(lit(0.5), lit(0.99)), lit(PctAccuracy))
          .as("pq"))
      .select($"event_type", $"hll_users",
        element_at($"pq", 1).as("p50_approx"), element_at($"pq", 2).as("p99_approx"))
    exact.join(approx, "event_type")
      .select(
        $"event_type", $"n_events", $"exact_users", $"p50_exact", $"p99_exact",
        (abs($"hll_users" - $"exact_users").cast("double") /
          $"exact_users" <= 3 * HllRsd).as("hll_ok"),
        // quantile sketch: observed value within ±5 % of the exact
        // order statistic (values are positive in this table)
        (abs($"p50_approx" - $"p50_exact") <= lit(0.05) * $"p50_exact").as("p50_ok"),
        (abs($"p99_approx" - $"p99_exact") <= lit(0.05) * $"p99_exact").as("p99_ok"))
      .orderBy($"event_type")
  }

  val sqlSketchStats: String = {
    def os(q: Double) =
      s"min(value) FILTER (WHERE rn >= CAST(ceil($q * n) AS BIGINT))"
    s"""SELECT event_type, count(*) AS n_events,
       |  count(DISTINCT user_id) AS exact_users,
       |  ${os(0.5)} AS p50_exact, ${os(0.99)} AS p99_exact,
       |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p99_ok
       |FROM (SELECT event_type, user_id, value,
       |        row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
