package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Source/sink format faces beyond parquet (reference ingests JSON wire
 * messages — upbit_connector.py:127-134 — and the persistence layer
 * round-trips typed rows; SURVEY §2.1). Schemas are always explicit:
 * inference is a full extra pass over the data at 100 TB and can
 * silently widen types between runs.
 */
object Formats {

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Streaming JSON-lines source over a directory (the file-based
    * stand-in for the WebSocket feed: drop files in, they stream). */
  def streamJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream.schema(schema).json(path)
}
