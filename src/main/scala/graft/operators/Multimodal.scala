package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing
import graft.sources.Tables

/**
 * Multimodal-column plumbing: media as opaque `binary` payloads with a
 * typed metadata struct, decoded/feature-extracted in batched
 * per-partition passes (driver-mandated extension; the reference's
 * analog is the opaque `raw_data` payload carried next to typed fields,
 * market_data.py:82).
 *
 * The real media decoders (image/audio libs) are NOT in this
 * environment, so the decode step is a clearly-marked deterministic
 * STUB — but everything Spark-side is real and tested: the schema
 * (payload + metadata struct), the partition-preserving batched UDF
 * shape (`mapPartitions` over row iterators, the JVM twin of
 * `mapInPandas`' batch contract), and the feature-column layout
 * downstream operators consume (the fake embedding feeds the same
 * Similarity operators as the real one would).
 */
object Multimodal {
  import Relational.ColInterp

  val FeatureDims = 4

  /** Documents with an opaque binary payload + metadata, the canonical
    * multimodal table shape: (id, payload: binary, meta: struct). */
  def payloadTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select(
        $"doc_id",
        to_binary($"text", lit("utf-8")).as("payload"),
        struct(
          lit("text/plain").as("mime"),
          octet_length(to_binary($"text", lit("utf-8"))).cast("long").as("n_bytes"),
          $"lang".as("lang")).as("meta"))

  // ------------------------------------------------------------------
  // STUB DECODER — deterministic fake. A real deployment replaces the
  // body with an image/audio decode (e.g. JPEG -> pixels -> model
  // features); the signature, batching, and output schema are the
  // contract and stay unchanged.
  // ------------------------------------------------------------------

  /** Fake "decoded features" of a payload: FeatureDims pseudo-channel
    * values derived from sha256 of the bytes — deterministic, engine-
    * reproducible, and shaped exactly like a real feature vector. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    (0 until FeatureDims).toArray.map { d =>
      // big-endian uint32 of digest word d, scaled to [0, 1)
      val w = ((digest(4 * d) & 0xffL) << 24) | ((digest(4 * d + 1) & 0xffL) << 16) |
        ((digest(4 * d + 2) & 0xffL) << 8) | (digest(4 * d + 3) & 0xffL)
      w.toDouble / 4294967296.0
    }
  }

  /** Decoded-feature row (Product ⇒ Catalyst encoder; columns keep the
    * declaration order). */
  final case class Decoded(
      doc_id: Long, n_bytes: Long, content_sha: String, features: Array[Double])

  /** Batched per-partition decode — the `mapInPandas` shape on the JVM:
    * one iterator in, one iterator out, no per-row task overhead, and
    * the input partitioning (e.g. by storage bucket) is preserved so a
    * 100 TB decode is pure data-parallel scan work. Stays a `Dataset`
    * transform (typed `mapPartitions`, not `.rdd`), so the plan keeps
    * Tungsten layout and column pruning on both sides of the decode. */
  def decodeFeatures(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits.{newProductEncoder, newSequenceEncoder}
    payloads.select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (docId, payload, nBytes) =>
          md.reset()
          val digestHex = md.digest(payload).map(b => f"$b%02x").mkString
          Decoded(docId, nBytes, digestHex, stubDecode(payload))
        }
      }
      .toDF()
  }

  // ------------------------------------------------------------------
  // Oracle-checked face: the same metadata + stub features computed as
  // pure Catalyst expressions (codegen path — at scale this is the one
  // to prefer whenever the "decode" is expressible; the mapPartitions
  // variant above exists for decoders that need native libs).
  // ------------------------------------------------------------------
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val pay = payloadTable(spark, dir)
    val f = (d: Int) =>
      (conv(substring(sha2($"payload", 256), 8 * d + 1, 8), 16, 10).cast("double") /
        4294967296.0).as(s"f$d")
    pay.select(
      $"doc_id",
      $"meta.mime".as("mime"),
      $"meta.n_bytes".as("n_bytes"),
      sha2($"payload", 256).as("content_sha"),
      f(0), f(1), f(2), f(3))
      .orderBy($"doc_id")
  }

  val sqlMultimodalFeatures: String = {
    val f = (d: Int) =>
      s"('0x' || substr(sha256(text), ${8 * d + 1}, 8))::BIGINT::DOUBLE / 4294967296.0 AS f$d"
    s"""SELECT doc_id, 'text/plain' AS mime,
       |  octet_length(encode(text))::BIGINT AS n_bytes,
       |  sha256(text) AS content_sha,
       |  ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
