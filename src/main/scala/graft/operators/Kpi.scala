package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * KPI dashboard aggregations (reference: arch doc:2243-2249 — win rate,
 * profit factor, cumulative totals per group; SURVEY §2.4 A9; the
 * running-max drawdown face is Relational.qRunningMaxDrawdown).
 *
 * One broadcast dimension join (customer segment) + one partial-agg
 * shuffle; the conditional aggregates share the single scan. Ratios are
 * computed from exact decimal sums cast to double, so they are
 * bit-reproducible under any partitioning.
 */
object Kpi {
  import Relational.ColInterp
  import Relational.{davg, dsum}

  /** Per-segment KPI rollup: order counts by status ("win" = filled F),
    * win rate, profit factor (F revenue / non-F revenue), averages. */
  def qKpiSegment(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        count(when($"o_orderstatus" === "F", 1)).as("n_filled"),
        dsum($"o_totalprice").as("total"),
        davg($"o_totalprice").as("avg_price"),
        dsum(when($"o_orderstatus" === "F", $"o_totalprice").otherwise(0.0))
          .as("filled_total"),
        dsum(when($"o_orderstatus" =!= "F", $"o_totalprice").otherwise(0.0))
          .as("open_total"),
        max($"o_totalprice").as("max_price"),
        min($"o_totalprice").as("min_price"))
      .withColumn("win_rate", $"n_filled".cast("double") / $"n_orders")
      .withColumn("profit_factor",
        $"filled_total" / nullif($"open_total", lit(0.0)))
      .orderBy($"c_mktsegment")

  val sqlKpiSegment: String =
    """WITH k AS (
      |  SELECT c_mktsegment,
      |    count(*) AS n_orders,
      |    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(o_totalprice) AS avg_price,
      |    CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS filled_total,
      |    CAST(sum(CAST(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS open_total,
      |    max(o_totalprice) AS max_price,
      |    min(o_totalprice) AS min_price
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT c_mktsegment, n_orders, n_filled, total, avg_price,
      |  filled_total, open_total, max_price, min_price,
      |  n_filled::DOUBLE / n_orders AS win_rate,
      |  filled_total / NULLIF(open_total, 0.0) AS profit_factor
      |FROM k ORDER BY c_mktsegment""".stripMargin
}
