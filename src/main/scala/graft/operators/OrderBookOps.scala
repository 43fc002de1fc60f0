package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Orderbook-style array analytics (reference: arch doc:576-581 top-N
 * ask-depth sum, arch doc:648-651 + 기획 doc:139-141 imbalance ratio,
 * protobuf_mapper.py:184-197 level arrays; SURVEY §2.4 A5–A6, §2.7 W6,
 * §2.8 F20).
 *
 * The book is modeled from lineitem: each order's lines become price
 * levels ordered by l_linenumber — odd lines are asks, even are bids.
 * One groupBy builds the level arrays (single shuffle on the key);
 * every array computation after that is per-row expression work
 * (`slice`/`aggregate`/`transform`), exactly how a real per-market
 * book state would be processed at scale: state sharded by key, array
 * math local to the row, no second shuffle.
 */
object OrderBookOps {
  import Relational.ColInterp

  val TopN = 3

  private def r6(c: Column): Column =
    c.cast(DecimalType(28, 12)).cast(DecimalType(18, 6)).cast("double")

  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  // ------------------------------------------------------------------
  // A5 top-N depth + A6 imbalance per order. Level arrays are built
  // sorted (sort_array over (linenumber, qty) structs makes
  // collect_list's arrival order irrelevant — deterministic under any
  // partitioning), then sliced/folded in place.
  // ------------------------------------------------------------------
  def qBookDepth(spark: SparkSession, dir: String): DataFrame = {
    val levels = sort_array(collect_list(struct($"l_linenumber", $"l_quantity")))
    val qtys = (side: Int) => transform(
      filter($"lv", x => x.getField("l_linenumber") % 2 === side),
      x => x.getField("l_quantity"))
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(levels.as("lv"))
      .select($"l_orderkey",
        size($"lv").cast("long").as("n_levels"),
        fsum(slice(transform($"lv", x => x.getField("l_quantity")), 1, TopN))
          .as("top3_sum"),
        fsum(qtys(1)).as("total_ask"),
        fsum(qtys(0)).as("total_bid"))
      .withColumn("imbalance", r6($"total_ask" / nullif($"total_bid", lit(0.0))))
      .orderBy($"l_orderkey")
  }

  /** Oracle note: list(x ORDER BY …) pins DuckDB's aggregation order the
    * same way sort_array pins Spark's; both folds are left-to-right over
    * small integer quantities so double sums are exact. */
  val sqlBookDepth: String =
    s"""WITH b AS (
       |  SELECT l_orderkey,
       |    list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs,
       |    list(l_quantity ORDER BY l_linenumber, l_quantity) FILTER (WHERE l_linenumber % 2 = 1) AS asks,
       |    list(l_quantity ORDER BY l_linenumber, l_quantity) FILTER (WHERE l_linenumber % 2 = 0) AS bids
       |  FROM lineitem GROUP BY 1)
       |SELECT l_orderkey,
       |  len(qs)::BIGINT AS n_levels,
       |  coalesce(list_sum(qs[:$TopN]), 0)::DOUBLE AS top3_sum,
       |  coalesce(list_sum(asks), 0)::DOUBLE AS total_ask,
       |  coalesce(list_sum(bids), 0)::DOUBLE AS total_bid,
       |  CAST(round(CAST(coalesce(list_sum(asks), 0)::DOUBLE /
       |    NULLIF(coalesce(list_sum(bids), 0)::DOUBLE, 0.0) AS DECIMAL(28,12)), 6) AS DOUBLE) AS imbalance
       |FROM b ORDER BY l_orderkey""".stripMargin
}
