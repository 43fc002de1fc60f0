package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf0001
import graft.functions.Hashing
import graft.sources.Tables

/** Semantic invariants for the round-6 curation operators — the
  * properties the DuckDB value gate pins by example but not by law:
  * budget selection respects and tightly fills its budget with a
  * quality-monotone frontier; corpus rewrite keeps exactly one
  * occurrence of every distinct segment and loses none; BM25 emits
  * well-formed positive-scored rankings. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("budget_select: budget respected, frontier quality-monotone, boundary filled tightly") {
    val out = Sampling.qBudgetSelect(spark, Sf0001)
      .select($"doc_id", $"q", $"n_tokens", $"selected").collect()
    val selected = out.filter(_.getLong(3) == 1L)
    val unselected = out.filter(_.getLong(3) == 0L)
    val budget = out.map(_.getLong(2)).sum / Sampling.BudgetDen
    val used = selected.map(_.getLong(2)).sum
    assert(used <= budget, s"selected $used tokens > budget $budget")
    assert(selected.nonEmpty && unselected.nonEmpty)
    // monotone frontier: no unselected doc outranks any selected doc
    assert(unselected.map(_.getLong(1)).max <= selected.map(_.getLong(1)).min)
    // tightness: the next boundary-bucket doc in fill order would not fit
    val qb = unselected.map(_.getLong(1)).max
    val nextUp = unselected.filter(_.getLong(1) == qb).minBy(_.getLong(0))
    assert(used + nextUp.getLong(2) > budget,
      "boundary fill stopped although the next doc still fits")
  }

  test("corpus_rewrite: every distinct segment survives exactly once, none invented") {
    val segs = Tables.documents(spark, Sf0001)
      .select($"doc_id", Hashing.tokens($"text").as("t"))
      .select($"doc_id",
        explode(sequence(lit(1), greatest(size($"t"), lit(1)), lit(Corpus.SegLen))).as("s"),
        $"t")
      .select(Hashing.h60(array_join(slice($"t", $"s", lit(Corpus.SegLen)), " ")).as("h"))
    val nDistinct = segs.distinct().count()
    val nTotal = segs.count()
    val rewrite = Corpus.qCorpusRewrite(spark, Sf0001)
      .agg(sum($"n_kept").as("kept"), sum($"n_segments").as("total"))
      .head()
    assert(rewrite.getLong(0) == nDistinct,
      s"kept ${rewrite.getLong(0)} segments, expected one per distinct hash ($nDistinct)")
    assert(rewrite.getLong(1) == nTotal)
  }

  test("bm25: rankings are dense, scores positive, matched terms bounded by the query") {
    val rows = TextOps.qBm25(spark, Sf0001)
      .select($"query_id", $"rank", $"score", $"n_terms").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= TextOps.QueryLen.toLong)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.length))
    }
  }
}
