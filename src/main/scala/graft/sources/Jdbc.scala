package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC source/sink (SURVEY §2.1 S4, §2.2 K3's DB face; reference:
 * arch doc's PostgreSQL position store + strategy_configs reload —
 * the reference reads/writes its relational state over JDBC). Tested
 * against embedded Derby (the only in-process engine in this
 * environment); the API takes any URL/driver, so a cluster deployment
 * points the same calls at PostgreSQL.
 *
 * Scale: [[readPartitioned]] is the 1000-executor path — N concurrent
 * range-bounded scans (one JDBC cursor per task), not one driver-side
 * cursor. Spark pushes filters and column pruning into the remote SQL
 * (PushedFilters on the JDBCRelation scan), so a selective query ships
 * predicates to the database instead of rows to the cluster.
 */
object Jdbc {

  /** Single-cursor read — fine for dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * cursors over `[lower, upper]` strides of `partitionColumn`. This
    * is the only JDBC shape that scales — reading a big table through
    * one cursor serializes the whole transfer through one task. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** Append/overwrite a DataFrame into a JDBC table (per-partition
    * batched inserts; pair with [[graft.streaming.Streams.idempotentAppend]]
    * semantics — deterministic ids + a unique constraint — for
    * exactly-once into the store, the reference's strategy). */
  def write(df: DataFrame, url: String, table: String, mode: String = "overwrite",
            props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
