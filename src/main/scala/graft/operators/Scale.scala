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

  // ------------------------------------------------------------------
  // Skew diagnostics: the measurement that tells you WHEN to reach for
  // the salting/AQE levers above. For a prospective join/group key,
  // emit the top-k heaviest keys with their share of the table and the
  // key's skew ratio (its count over the mean count per key). Two
  // map-side-combined aggregates over slim (key) rows + a top-k that
  // runs as TakeOrderedAndProject — the diagnostic itself stays cheap
  // at any scale, which is the point: you run it BEFORE the expensive
  // join, on the join column only.
  // ------------------------------------------------------------------
  val HeavyHitterK = 20

  def qHeavyHitters(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val counts = Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum($"cnt").as("n_rows"), count(lit(1)).as("n_keys"))
    val r6 = (c: Column) =>
      c.cast(DecimalType(28, 12)).cast(DEC).cast("double")
    counts.crossJoin(broadcast(totals))
      .select($"user_id", $"cnt",
        r6($"cnt" / $"n_rows").as("share"),
        r6($"cnt" * $"n_keys" / $"n_rows").as("skew_ratio"))
      .orderBy($"cnt".desc, $"user_id")
      .limit(HeavyHitterK)
  }

  // ------------------------------------------------------------------
  // Range-sorted compaction writer: materialize a frame as
  // ceil(rows / targetRows) parquet files with DISJOINT key ranges,
  // each internally sorted. This is the export-layout step that fixes
  // the two failure modes of naive writes at 100 TB: thousands of tiny
  // files per partition (every downstream scan pays per-file open
  // cost), and key-shuffled files whose parquet min/max stats prune
  // nothing. Range partitioning gives file-level pruning on the sort
  // key (a key-range predicate touches exactly the files that hold
  // it); the within-file sort gives row-group-level pruning inside
  // each file. Returns the number of data files ACTUALLY written (by
  // listing the output) — repartitionByRange can produce fewer
  // non-empty partitions than requested when the key has few distinct
  // values or heavy ties, so the plan count would over-report.
  //
  // `rowCount`: pass the input size when the caller already knows it —
  // otherwise the writer pays one extra counting scan of `df` to size
  // the partitioning.
  // ------------------------------------------------------------------
  def writeRangeSorted(df: DataFrame, key: String, targetRows: Long,
                       path: String, rowCount: Option[Long] = None): Long = {
    val n = rowCount.getOrElse(df.count())
    val files = math.max(1L, (n + targetRows - 1) / targetRows)
    df.repartitionByRange(files.toInt, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count { s =>
      val name = s.getPath.getName
      s.isFile && name.startsWith("part-") && !name.endsWith(".crc")
    }.toLong
  }

  val sqlHeavyHitters: String = {
    val r6 = (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"
    s"""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
       |t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM c)
       |SELECT user_id, cnt,
       |  ${r6("cnt / n_rows")} AS share,
       |  ${r6("cnt * n_keys / n_rows")} AS skew_ratio
       |FROM c CROSS JOIN t
       |ORDER BY cnt DESC, user_id LIMIT $HeavyHitterK""".stripMargin
  }
}
