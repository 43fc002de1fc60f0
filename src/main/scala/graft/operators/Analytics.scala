package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Dashboard analytics beyond plain GROUP BY (reference: the KPI
 * dashboard's per-group views and latency histograms — arch
 * doc:2243-2249, kafka_producer.py:44-63; SURVEY §2.4 A7/A9).
 *
 * Quantiles use the order statistic at ceil(q·n) (no interpolation):
 * deterministic under any partitioning and bit-identical across
 * engines, unlike percentile_approx sketches or interpolated
 * percentiles whose float math differs. Rollup/pivot are single-scan,
 * partial-agg shapes.
 */
object Analytics {
  import Relational.ColInterp
  import Relational.dsum

  /** p50/p90/p99 of value per event type, exact order statistics. */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val ranked = Tables.events(spark, dir)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
    def orderStat(q: Double) =
      min(when($"rn" >= ceil(lit(q) * $"n").cast("long"), $"value"))
    ranked.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        orderStat(0.5).as("p50"), orderStat(0.9).as("p90"), orderStat(0.99).as("p99"))
      .orderBy($"event_type")
  }

  val sqlQuantiles: String = {
    def os(q: Double) =
      s"min(value) FILTER (WHERE rn >= CAST(ceil($q * n) AS BIGINT))"
    s"""SELECT event_type, count(*) AS n,
       |  ${os(0.5)} AS p50, ${os(0.9)} AS p90, ${os(0.99)} AS p99
       |FROM (SELECT event_type, value,
       |        row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Segment × status rollup with subtotals and a grand total (the
    * dashboard drill-down shape; NULL marks the rolled-up level). */
  def qKpiRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .rollup($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"o_orderstatus".asc_nulls_first)

  val sqlKpiRollup: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
      |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** Status pivot: one row per segment, one revenue column per order
    * status (explicit value list — required for a stable schema). */
  def qStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy($"c_mktsegment")

  val sqlStatusPivot: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,6))) AS DOUBLE) AS total_f,
      |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,6))) AS DOUBLE) AS total_o,
      |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(18,6))) AS DOUBLE) AS total_p
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
