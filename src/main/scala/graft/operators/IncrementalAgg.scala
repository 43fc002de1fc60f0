package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Incrementally-maintainable rollups: the pattern that keeps a 100 TB
 * aggregate table fresh without re-scanning history. The per-key state
 * is a commutative monoid — (count, exact decimal sum, min, max) — so
 * `merge(rollup(A), rollup(B)) == rollup(A ∪ B)` exactly, for any
 * split of the data: a day's delta folds into the standing table with
 * work proportional to the delta, and averages derive at read time as
 * sum/count.
 *
 * Decimal sums make the monoid exact (double summation would drift by
 * merge order and the equality below would only hold approximately).
 * Reference analogue: the daily KPI rollups the dashboards re-read
 * (arch doc:2243-2249) — recomputed from scratch there, maintained
 * incrementally here.
 */
object IncrementalAgg {
  import Relational.ColInterp

  private val DEC = DecimalType(28, 6)

  /** Mergeable rollup state of `valueCol` per `keyCols`. */
  def rollup(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(F.col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(F.col(valueCol).cast(DEC)).cast(DEC).as("sum_v"),
        min(F.col(valueCol)).as("min_v"),
        max(F.col(valueCol)).as("max_v"))

  /** Fold a delta rollup into a standing rollup (same schema). The
    * shuffle carries one state row per touched key — delta-sized, not
    * history-sized. */
  def merge(existing: DataFrame, delta: DataFrame): DataFrame = {
    val keyCols = existing.columns.filterNot(Set("n", "sum_v", "min_v", "max_v"))
    existing.unionByName(delta)
      .groupBy(keyCols.map(F.col).toSeq: _*)
      .agg(
        sum($"n").cast("long").as("n"),
        sum($"sum_v").cast(DEC).as("sum_v"),
        min($"min_v").as("min_v"),
        max($"max_v").as("max_v"))
  }

  /** Read-time derivation: exact decimal mean from the state. */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_v", ($"sum_v" / $"n").cast(DEC).cast("double"))

  // ------------------------------------------------------------------
  // Gate face: the merge path itself under the driver's value oracle.
  // The Spark side computes rollup(delta₀) ⊕ rollup(delta₁) (events
  // split by event_id parity — two "days"); the DuckDB oracle computes
  // the single-pass aggregate over everything. They hash-equal exactly
  // BECAUSE the state is an exact monoid — the merge ≡ recompute law
  // the spec pins in-engine, here checked cross-engine on real data.
  // ------------------------------------------------------------------
  def qIncrementalRollup(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"event_id", $"event_type", ($"user_id" % 100).as("cohort"), $"value")
    val keys = Seq("event_type", "cohort")
    val merged = merge(
      rollup(ev.filter($"event_id" % 2 === 0), keys, "value"),
      rollup(ev.filter($"event_id" % 2 =!= 0), keys, "value"))
    // avg derived in double on both sides (double ÷ long), sum exposed
    // as double — the repo-wide r6 stance for cross-engine floats
    merged.select($"event_type", $"cohort", $"n",
      $"sum_v".cast("double").as("sum_v"), $"min_v", $"max_v")
      .withColumn("avg_v", $"sum_v" / $"n")
      .orderBy($"event_type", $"cohort")
  }

  val sqlIncrementalRollup: String =
    """SELECT event_type, cohort, n, sum_v, min_v, max_v, sum_v / n AS avg_v
      |FROM (
      |  SELECT event_type, user_id % 100 AS cohort, count(*) AS n,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_v,
      |    min(value) AS min_v, max(value) AS max_v
      |  FROM events GROUP BY 1, 2)
      |ORDER BY event_type, cohort""".stripMargin
}
