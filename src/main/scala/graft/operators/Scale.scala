package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Skew and co-location utilities — the remaining 100 TB levers beyond
 * AQE (which GraftSession enables): explicit salting for aggregations
 * whose key distribution is pathological, and bucketed tables for
 * repeated fact-fact joins.
 *
 * Salting: a hot key that owns 30% of a 100 TB table puts 30 TB
 * through one reducer. Stage 1 groups by (key, salt) — the hot key's
 * rows spread over `salts` reducers; stage 2 merges the partials (rows
 * = |keys|·salts, trivially small). Only algebraic aggregates compose
 * this way; the helpers below cover count/sum (exact-decimal).
 */
object Scale {
  import Relational.ColInterp

  private val DEC = DecimalType(18, 6)

  /** Deterministic salt in [0, salts): hash-derived from a tiebreak
    * column, not `rand()` (reproducibility is part of the engine's
    * contract). */
  def saltCol(tiebreak: Column, salts: Int): Column =
    pmod(hash(tiebreak), lit(salts))

  /** Two-stage salted `count + exact-decimal sum` per key. Result is
    * identical to the direct groupBy (decimal partials commute);
    * the shuffle skew on a hot key drops by `salts`×. */
  def saltedCountSum(df: DataFrame, key: String, value: String, tiebreak: String,
                     salts: Int = 16): DataFrame =
    df.select(col(key), col(value), saltCol(col(tiebreak), salts).as("_salt"))
      .groupBy(col(key), $"_salt")
      .agg(count(lit(1)).as("_n"), sum(col(value).cast(DEC)).as("_s"))
      .groupBy(col(key))
      .agg(sum($"_n").as("n"), sum($"_s").cast("double").as("total"))
}
