package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Corrupt-record quarantine for JSON ingestion (the S-family file face
 * of P9 validation: the reference's ingestion service counts and
 * routes malformed payloads — ingestion_service.py:165-222 — instead
 * of failing the feed or silently dropping). Spark's PERMISSIVE parse
 * captures each unparseable line in a corrupt-record column; this
 * reader splits the scan into (good, quarantine) so bad lines are
 * auditable and replayable downstream.
 *
 * Scale notes: one scan serves both frames; the quarantine side
 * carries the RAW line (the only honest artifact for re-parsing after
 * a schema fix). Spark restriction honored here: a query referencing
 * ONLY the corrupt column over a JSON scan throws
 * (QUERIED_CORRUPT_RECORD_COLUMN) because the pruned parse can't know
 * corruptness — the split therefore materializes the parsed frame
 * once (cache) before filtering, which is also what a real pipeline
 * wants: parse once, route twice.
 */
object JsonQuarantine {

  val CorruptCol = "_corrupt_record"

  /** Both routes of one parse, plus the handle releasing the shared
    * cached scan (the merge-face release contract). */
  final case class Split(good: DataFrame, quarantine: DataFrame,
      release: () => Unit)

  /** Parse `path` with `schema`; good rows and quarantined raw lines
    * share ONE cached parse. Callers release() after consuming both. */
  def readSplit(spark: SparkSession, path: String,
      schema: StructType): Split = {
    val parsed = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(CorruptCol).isNull)
      .drop(CorruptCol)
    val quarantine = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    Split(good, quarantine, () => { parsed.unpersist(); () })
  }
}
