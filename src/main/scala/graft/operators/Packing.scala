package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SecondarySort
import graft.sources.Tables

/**
 * Sequence packing: assign documents to fixed token-budget training
 * sequences ("bins") — the step between a filtered corpus and a
 * pretraining dataloader, where short documents are concatenated up to
 * the context length so no batch slot is wasted. Token counts use the
 * same BPE-ish regex as [[TextOps.qTokenCount]] (so the count itself
 * is already value-gated).
 *
 * Algorithm: deterministic per-shard NEXT-FIT — docs are sharded by
 * `doc_id % NumShards`, walked in doc_id order, and a bin closes when
 * the next document would overflow [[TokenBudget]] (an oversized
 * document still gets a bin of its own). Packing is inherently a
 * sequential fold, so the scale shape is the repo's spillable
 * secondary-sort FSM (one shuffle on shard, external sort, O(1) state
 * per shard — core/SecondarySort.scala): 1000 executors pack 1000s of
 * shards independently, and shard count scales with the corpus while
 * the per-shard walk stays a cheap streaming pass. Next-fit (not
 * first-fit-decreasing) on a hash shard is the standard large-corpus
 * choice: within-bin order stays document order, waste is bounded by
 * the mean doc length, and the result is reproducible under any
 * cluster layout.
 */
object Packing {
  import Relational.ColInterp

  val NumShards = 8
  val TokenBudget = 512L

  def qSequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.newProductEncoder
    val toks = Tables.documentsSharded(spark, dir)
      .select(($"doc_id" % NumShards).as("shard"), $"doc_id",
        size(regexp_extract_all($"text", lit(TextOps.BpeIshPattern), lit(0)))
          .cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
    val packed = toks
      .repartition(col("shard"))
      .sortWithinPartitions($"shard", $"doc_id")
      .mapPartitions { it =>
        SecondarySort.runs(it)(_._1).flatMap { case (shard, docs) =>
          var bin = -1L
          var fill = 0L
          var first = true // the first doc always opens bin 0
          docs.map { case (_, docId, n) =>
            if (first || fill + n > TokenBudget) { bin += 1; fill = n; first = false }
            else fill += n
            (docId, shard, n, bin, fill)
          }
        }
      }
    packed.toDF("doc_id", "shard", "n_tokens", "bin", "bin_fill")
      .orderBy($"doc_id")
  }

  /** Oracle: the same next-fit walk as a recursive CTE (one step per
    * row per shard, joined on the shard-local row number). */
  val sqlSequencePack: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id % $NumShards AS shard, doc_id,
       |    len(regexp_extract_all(text, '${TextOps.BpeIshPattern}'))::BIGINT AS n_tokens,
       |    row_number() OVER (PARTITION BY doc_id % $NumShards ORDER BY doc_id) AS rn
       |  FROM documents),
       |walk(shard, rn, doc_id, n_tokens, bin, bin_fill) AS (
       |  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, n_tokens FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
       |    CASE WHEN w.bin_fill + d.n_tokens > $TokenBudget THEN w.bin + 1 ELSE w.bin END,
       |    CASE WHEN w.bin_fill + d.n_tokens > $TokenBudget THEN d.n_tokens
       |         ELSE w.bin_fill + d.n_tokens END
       |  FROM walk w JOIN d ON d.shard = w.shard AND d.rn = w.rn + 1)
       |SELECT doc_id, shard, n_tokens, bin, bin_fill
       |FROM walk ORDER BY doc_id""".stripMargin
}
