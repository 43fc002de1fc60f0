package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ------------------------------------------------------------------
  // Sharpe ratio per segment over daily revenue "returns" (arch
  // doc:2243-2249 리스크: 샤프 지수). Stddev comes from exact decimal
  // moments — sum(x) and sum(x²) as decimals, variance assembled in
  // double at the end — so the result is bit-reproducible under any
  // partitioning (a plain stddev_samp over doubles is summation-order
  // dependent and would flunk the cross-engine hash).
  //
  // Scale: two partial-agg shuffles (day×segment, then segment), both
  // map-side combined; no window, no sort until the final 5-row output.
  // ------------------------------------------------------------------
  def qKpiSharpe(spark: SparkSession, dir: String): DataFrame = {
    val DEC = org.apache.spark.sql.types.DecimalType(18, 6)
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderdate")
      .agg(dsum($"o_totalprice").as("day_total"))
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_days"),
        sum($"day_total".cast(DEC)).cast("double").as("sum_r"),
        sum($"day_total".cast(DEC) * $"day_total".cast(DEC)).cast("double").as("sum_r2"))
      .withColumn("mean_daily", $"sum_r" / $"n_days")
      .withColumn("stddev_daily",
        sqrt(greatest(
          ($"sum_r2" - $"sum_r" * $"sum_r" / $"n_days") / nullif($"n_days" - 1, lit(0)),
          lit(0.0))))
      .withColumn("sharpe", $"mean_daily" / nullif($"stddev_daily", lit(0.0)))
      .select($"c_mktsegment", $"n_days", $"mean_daily", $"stddev_daily", $"sharpe")
      .orderBy($"c_mktsegment")
  }

  val sqlKpiSharpe: String =
    """WITH d AS (
      |  SELECT c_mktsegment, o_orderdate,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS day_total
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT c_mktsegment, count(*) AS n_days,
      |    CAST(sum(CAST(day_total AS DECIMAL(18,6))) AS DOUBLE) AS sum_r,
      |    -- (19,6)×(19,6) → (38,12): forces int128 math in DuckDB (the
      |    -- (18,6) product would overflow int64); exact either way.
      |    -- The VARCHAR hop makes the decimal→double cast correctly
      |    -- rounded (DuckDB's direct (38,12)→DOUBLE cast can be off by
      |    -- one ulp, which Spark's BigDecimal.doubleValue never is).
      |    CAST(CAST(sum(CAST(day_total AS DECIMAL(19,6)) * CAST(day_total AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sum_r2
      |  FROM d GROUP BY 1),
      |s AS (
      |  SELECT c_mktsegment, n_days, sum_r / n_days AS mean_daily,
      |    sqrt(greatest((sum_r2 - sum_r * sum_r / n_days) / NULLIF(n_days - 1, 0), 0.0)) AS stddev_daily
      |  FROM m)
      |SELECT c_mktsegment, n_days, mean_daily, stddev_daily,
      |  mean_daily / NULLIF(stddev_daily, 0.0) AS sharpe
      |FROM s ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // Average position holding time (arch doc:2243-2249 효율성: 평균
  // 포지션 보유 시간): order placed → line shipped, per order priority.
  // The day-count is integral, so the mean is an exact decimal ratio.
  //
  // Scale: one shuffle join on orderkey (both sides big → sort-merge
  // under AQE) + one partial agg; datediff is row-local codegen.
  // ------------------------------------------------------------------
  def qKpiHolding(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff($"l_shipdate", $"o_orderdate").cast("long").as("holding_days"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        dsum($"holding_days").as("sum_days"),
        max($"holding_days").as("max_days"),
        min($"holding_days").as("min_days"))
      .withColumn("avg_holding_days", $"sum_days" / $"n_lines")
      .orderBy($"o_orderpriority")

  val sqlKpiHolding: String =
    """SELECT o_orderpriority, n_lines, sum_days, max_days, min_days,
      |  sum_days / n_lines AS avg_holding_days
      |FROM (
      |  SELECT o_orderpriority, count(*) AS n_lines,
      |    CAST(sum(CAST(date_diff('day', o_orderdate, l_shipdate) AS DECIMAL(18,6))) AS DOUBLE) AS sum_days,
      |    max(date_diff('day', o_orderdate, l_shipdate))::BIGINT AS max_days,
      |    min(date_diff('day', o_orderdate, l_shipdate))::BIGINT AS min_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1)
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------------
  // Slippage distribution (arch doc:2243-2249 거래 품질: 평균
  // 슬리피지 — fill price vs signal price): fill value minus list
  // value per line, exact decimal arithmetic end-to-end; mean plus
  // p50/p90/p99 as exact order statistics (the qQuantiles pattern — no
  // interpolation, engine-portable).
  //
  // Scale: part joins broadcast; one window sort per brand partition
  // for the order statistics; no all-pairs or skew hazard.
  // ------------------------------------------------------------------
  def qKpiSlippage(spark: SparkSession, dir: String): DataFrame = {
    val DEC = org.apache.spark.sql.types.DecimalType(18, 6)
    val slipped = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice".cast(DEC) - $"p_retailprice".cast(DEC) * $"l_quantity".cast(DEC))
          .cast("double").as("slippage"))
    val w = Window.partitionBy($"p_brand").orderBy($"slippage", $"l_orderkey", $"l_linenumber")
    val ranked = slipped
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"p_brand")))
    def orderStat(q: Double) =
      min(when($"rn" >= ceil(lit(q) * $"n").cast("long"), $"slippage"))
    ranked.groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        dsum($"slippage").as("sum_slippage"),
        orderStat(0.5).as("p50"), orderStat(0.9).as("p90"), orderStat(0.99).as("p99"))
      .withColumn("avg_slippage", $"sum_slippage" / $"n_lines")
      .orderBy($"p_brand")
  }

  val sqlKpiSlippage: String = {
    def os(q: Double) =
      s"min(slippage) FILTER (WHERE rn >= CAST(ceil($q * n) AS BIGINT))"
    s"""SELECT p_brand, count(*) AS n_lines,
       |  CAST(sum(CAST(slippage AS DECIMAL(18,6))) AS DOUBLE) AS sum_slippage,
       |  ${os(0.5)} AS p50, ${os(0.9)} AS p90, ${os(0.99)} AS p99,
       |  CAST(sum(CAST(slippage AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_slippage
       |FROM (
       |  SELECT p_brand, l_orderkey, l_linenumber,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,6))
       |         - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) AS DOUBLE) AS slippage,
       |    row_number() OVER (PARTITION BY p_brand ORDER BY
       |      CAST(CAST(l_extendedprice AS DECIMAL(18,6))
       |           - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) AS DOUBLE),
       |      l_orderkey, l_linenumber) AS rn,
       |    count(*) OVER (PARTITION BY p_brand) AS n
       |  FROM lineitem JOIN part ON l_partkey = p_partkey)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
