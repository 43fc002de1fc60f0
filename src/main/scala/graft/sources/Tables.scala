package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet table loaders over the driver-generated star schema
 * (TESTDATA.md). Columns are selected lazily by Catalyst — a query that
 * projects two columns reads two columns from parquet (check
 * `ReadSchema` in `.explain("formatted")`).
 *
 * At 100 TB these would be directory-partitioned (e.g. orders by
 * `o_orderdate` month, events by date) so time predicates prune
 * partitions; the loaders keep a single `load` seam so that swap is a
 * one-line change per table.
 */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** `events.ts` normalization — schema-adaptive because the driver
    * has shipped this column two ways across rounds:
    *  - parquet TIMESTAMP(NANOS): with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    GraftSession) it surfaces as long nanos; integer `div 1000` →
    *    micros is exact (never float: ns epochs exceed 2^53) and
    *    matches DuckDB's cast truncation.
    *  - parquet TIMESTAMP(MICROS) without timezone: surfaces as
    *    TIMESTAMP_NTZ; the cast to TIMESTAMP is an exact relabel under
    *    the session's UTC zone and matches DuckDB's `epoch_ms(ts)`
    *    reading of the same naive value. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case dt =>
        // only the two driver schemas above are known-exact relabels; a
        // third drift (STRING, INT32, …) must fail loudly, not coerce
        // into silently wrong timestamps
        throw new IllegalStateException(
          s"events.ts has unexpected type $dt — add an exactness-checked branch")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Corpus tables re-sharded for expression-heavy per-row work
    * (hashing/shingling/vector math). The test parquet is a single row
    * group, which Spark cannot split — without this every sha lands on
    * one core. The shuffle moves only the raw bytes (tiny vs the
    * compute); on a real multi-file 100 TB corpus the scan already has
    * thousands of splits and this balances stragglers instead. */
  def documentsSharded(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddingsSharded(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
}
