package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Relational operator surface (SURVEY.md §2.3–§2.7): projections,
 * filters, aggregations, joins, window functions, set ops, sort/limit.
 *
 * Determinism contract: every query here is hash-compared against a
 * DuckDB oracle, so floating-point aggregates are computed on
 * DECIMAL(18,6)-cast inputs (exact, order-independent sums) and cast
 * back to DOUBLE, and every result carries a total ordering.
 *
 * Scale notes are on each operator; the common ones: aggregations are
 * partial (map-side combine) by construction, dimension joins are
 * broadcast, fact-fact joins shuffle on their join key only after
 * filters are pushed to the parquet scan.
 */
object Relational {

  /** `$"col"` without a SparkSession in scope. */
  implicit class ColInterp(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  private val DEC = DecimalType(18, 6)

  /** Exact order-independent sum: decimal-cast, sum, back to double. */
  def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")

  /** Deterministic average: exact decimal sum / count, in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** sum(price * (1 - disc)) on exact decimals (TPC-H style revenue).
    * The product has true scale ≤ 4 (2dp × 2dp inputs), so re-scaling
    * the scale-12 sum to scale 6 is lossless; it also keeps the
    * unscaled value under 2^53 so the final double cast is correctly
    * rounded identically in Spark and DuckDB (a scale-12 decimal's
    * double cast double-rounds in DuckDB). */
  def drevenue(price: Column, disc: Column): Column =
    sum(price.cast(DEC) * (lit(java.math.BigDecimal.ONE) - disc.cast(DEC)))
      .cast(DecimalType(38, 6)).cast("double")

  // --------------------------------------------------------------
  // A1/A9-style aggregation: pricing summary (map-side partial agg,
  // 6 groups — the shuffle moves only 6xN partial rows).
  // --------------------------------------------------------------
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        drevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  // --------------------------------------------------------------
  // P5/P9 + A-agg: predicate-pushdown filter + aggregate (TPC-H Q6
  // style). Filters reach the parquet scan (PushedFilters), only 4
  // columns are read.
  // --------------------------------------------------------------
  def q6FilteredRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        $"l_shipdate" <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice".cast(DEC)) * ($"l_discount".cast(DEC)))
             .cast(DecimalType(38, 6)).cast("double").as("revenue"),
           count(lit(1)).as("n"))

  // --------------------------------------------------------------
  // J3: multi-way equi-join (region ⋈ nation ⋈ customer ⋈ orders ⋈
  // lineitem). region/nation are broadcast by Catalyst (tiny); the
  // orders⋈lineitem join shuffles on orderkey. Mirrors the
  // v_trade_performance view shape (SURVEY §2.5 J3).
  // --------------------------------------------------------------
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(drevenue($"l_extendedprice", $"l_discount").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"n_name")

  // --------------------------------------------------------------
  // J4: anti-join (reconciliation "ghost position" shape — rows in A
  // with no match in B). Catalyst broadcasts the smaller side.
  // --------------------------------------------------------------
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")

  // --------------------------------------------------------------
  // J4-dual: semi-join (EXISTS).
  // --------------------------------------------------------------
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter($"o_totalprice" > 400000.0),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_acctbal")
      .orderBy($"c_custkey")

  // --------------------------------------------------------------
  // J5: broadcast dimension enrichment (lineitem ⋈ part). part is tiny
  // relative to lineitem at every SF → explicit broadcast hint; at
  // 100 TB the fact side streams through executors with zero shuffle.
  // --------------------------------------------------------------
  def qBroadcastEnrich(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
           dsum($"l_extendedprice").as("total_price"),
           max($"l_quantity").as("max_qty"))
      .orderBy($"p_brand")

  // --------------------------------------------------------------
  // J2: stream-table equi-join shape (orders enriched with customer,
  // per-status rollup — the trade⋈trade_cycles matching query).
  // --------------------------------------------------------------
  def qOrderCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           dsum($"o_totalprice").as("total"),
           davg($"o_totalprice").as("avg_price"))
      .orderBy($"c_mktsegment", $"o_orderstatus")

  // --------------------------------------------------------------
  // W4: running max + drawdown (KPI dashboard, arch doc:2243-2249).
  // Total ordering inside each partition via (date, key) tiebreak.
  // --------------------------------------------------------------
  def qRunningMaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 50)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("running_max", max($"o_totalprice").over(w))
      .withColumn("drawdown", (col("running_max").cast(DEC) - $"o_totalprice".cast(DEC)).cast("double"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  // --------------------------------------------------------------
  // W5-style: top-N per key via row_number (deterministic tiebreak).
  // --------------------------------------------------------------
  def qTopNPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .orderBy($"o_custkey", $"rk")
  }

  // --------------------------------------------------------------
  // L1: global sort / limit (top-k via per-partition heap + final
  // merge — Spark's TakeOrderedAndProject, no full sort at scale).
  // --------------------------------------------------------------
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)

  // --------------------------------------------------------------
  // U1: union of two filtered streams, tagged (the 4-stream connect
  // encoding, SURVEY §2.5 J1 — tagged union then keyed processing).
  // --------------------------------------------------------------
  def qTaggedUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", lit("PURCHASE").as("tag"), $"value")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", lit("ERROR").as("tag"), $"value")
    purchases.unionByName(errors)
      .groupBy($"user_id", $"tag")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"user_id", $"tag")
  }

  // --------------------------------------------------------------
  // U1 (set-op faces): INTERSECT / EXCEPT — the reconciliation
  // diffing primitives (users who clicked AND purchased, minus any
  // who errored). Both are hash aggregations on the key at scale.
  // --------------------------------------------------------------
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def usersOf(t: String) = ev.filter($"event_type" === t).select($"user_id")
    usersOf("click").intersect(usersOf("purchase"))
      .except(usersOf("error"))
      .orderBy($"user_id")
  }

  val sqlSetOps: String =
    """SELECT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------
  // D1: exact distinct (dedup by full projection — deterministic,
  // unlike dropDuplicates' arbitrary row pick).
  // --------------------------------------------------------------
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"user_id", $"event_type")
      .distinct()
      .orderBy($"user_id", $"event_type")

  // --------------------------------------------------------------
  // A2: per-type counts (the connection-test stats dict).
  // --------------------------------------------------------------
  def qTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           countDistinct($"user_id").as("n_users"),
           dsum($"value").as("total_value"))
      .orderBy($"event_type")

}
