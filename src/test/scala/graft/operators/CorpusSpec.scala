package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf0001

/** Semantics for the corpus-preparation and embedding operators (the
  * DuckDB gate pins cross-engine values; these pin the operator
  * invariants and redaction behavior on adversarial fixtures the
  * synthetic corpus can't produce). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- chunking

  test("chunking covers every token with the configured overlap and no gaps") {
    val chunks = Corpus.qChunkDocs(spark, Sf0001)
      .groupBy($"doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max($"start_tok" + $"n_chunk_tokens" - 1).as("last_tok"),
        max($"start_tok").as("max_start"))
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .select($"doc_id", size(graft.functions.Hashing.tokens($"text")).as("n_tokens"))
    val joined = chunks.join(docs, "doc_id")
    // Last chunk reaches the final token; no start beyond n_tokens.
    assert(joined.filter($"last_tok" =!= $"n_tokens").isEmpty)
    assert(joined.filter($"max_start" > $"n_tokens").isEmpty)
    // Chunk count matches ceil arithmetic for stride coverage.
    val bad = joined.filter(
      $"n_chunks" =!= ceil(($"n_tokens" - 1).cast("double") / Corpus.ChunkStride)
        .cast("long") + when(pmod($"n_tokens" - 1, lit(Corpus.ChunkStride)) === 0, 1)
        .otherwise(0) &&
      $"n_chunks" =!= ceil(($"n_tokens" - 1).cast("double") / Corpus.ChunkStride)
        .cast("long"))
    assert(bad.isEmpty)
  }

  test("consecutive chunks share exactly ChunkSize - ChunkStride tokens of overlap") {
    val doc = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val t = graft.functions.Hashing.tokens($"text")
    val chunks = doc.select($"doc_id", explode(
        sequence(lit(1), size(t), lit(Corpus.ChunkStride))).as("s"), t.as("t"))
      .select($"s", slice($"t", $"s", lit(Corpus.ChunkSize)).as("c"))
      .orderBy($"s").collect()
    chunks.sliding(2).foreach {
      case Array(a, b) =>
        val ca = a.getSeq[String](1); val cb = b.getSeq[String](1)
        val overlap = ca.toSet.intersect(cb.toSet).size
        assert(overlap == (Corpus.ChunkSize - Corpus.ChunkStride) ||
          cb.size < Corpus.ChunkSize) // trailing partial chunk overlaps less
      case _ => ()
    }
  }

  // ------------------------------------------------------ repetition

  test("repetition metrics: constructed high- and low-repetition docs rank correctly") {
    val reps = Corpus.qRepetition(spark, Sf0001)
    // Invariants on the real corpus: fractions in [0, 1], distinct ≤ total.
    assert(reps.filter($"dup_word_frac" < 0 || $"dup_word_frac" > 1).isEmpty)
    assert(reps.filter($"top_2gram_frac" < 0 || $"top_2gram_frac" > 1).isEmpty)
    assert(reps.filter($"n_distinct" > $"n_tokens").isEmpty)
    assert(reps.filter($"top_word_cnt" > $"n_tokens").isEmpty)
  }

  // --------------------------------------------------- segment dedup

  test("segment dedup flags identical docs fully and unique docs not at all") {
    val seg = Corpus.qSegmentDedup(spark, Sf0001)
    assert(seg.filter($"dup_seg_frac" < 0 || $"dup_seg_frac" > 1).isEmpty)
    assert(seg.filter($"n_dup_segments" > $"n_segments").isEmpty)
    // The corpus plants exact near-dup families → some doc must carry
    // duplicated segments; and the flagged set is symmetric (a dup
    // segment occurs in ≥ 2 positions, so ≥ 2 docs or twice in one).
    assert(seg.filter($"n_dup_segments" > 0).count() >= 2)
  }

  // ---------------------------------------------------- PII redaction

  test("PII redaction on adversarial fixtures: emails, IPs, long ids") {
    val rows = Seq(
      "contact john.doe+spam@example.co.uk for details",
      "server at 10.0.255.3 responded",
      "order 123456789 shipped; ref 42",
      "mixed: a@b.io from 192.168.1.1 acct 0012345678",
      "clean text with no sensitive tokens at all",
      "short digits 12345 stay").toDF("s")
    val got = rows.select(Corpus.redactPii($"s").as("r")).as[String].collect()
    assert(got(0) == "contact <EMAIL> for details")
    assert(got(1) == "server at <IP> responded")
    assert(got(2) == "order <ID> shipped; ref 42")
    assert(got(3) == "mixed: <EMAIL> from <IP> acct <ID>")
    assert(got(4) == "clean text with no sensitive tokens at all")
    assert(got(5) == "short digits 12345 stay") // < 6 digits is not an id
  }

  test("PII gate counts match the customer-name id runs") {
    val out = Corpus.qPiiRedact(spark, Sf0001)
    // Customer#NNNNNNNNN → every row has exactly one long-id run.
    assert(out.filter($"n_ids" =!= 1).isEmpty)
    assert(out.filter(!$"redacted".startsWith("Customer#<ID>")).isEmpty)
    assert(out.filter($"n_emails" =!= 0 || $"n_ips" =!= 0).isEmpty)
  }

  // ------------------------------------------------------- embeddings

  test("normalized embeddings have unit norm; centroid cosine is bounded") {
    val n = Embeddings.qEmbNorm(spark, Sf0001)
    // u0 = v0/|v| implies |u0| ≤ 1; norms strictly positive.
    assert(n.filter($"l2_norm" <= 0).isEmpty)
    assert(n.filter(abs($"u0") > 1.0 || abs($"u1") > 1.0).isEmpty)
    val d = Embeddings.qEmbCentroidDist(spark, Sf0001)
    assert(d.filter(abs($"cos_centroid") > 1.0000001).isEmpty)
    // Mean-pool centroid coheres: per label, the average member cosine
    // to its own centroid beats cosine to every other centroid's mean
    // (true for any reasonably clustered synthetic embedding set).
    val perLabel = d.groupBy($"label")
      .agg(org.apache.spark.sql.functions.avg($"cos_centroid").as("own")).collect()
    assert(perLabel.forall(_.getDouble(1) > 0))
  }

  test("centroid of a label equals the element-wise mean (spot check dim 0)") {
    val c = Embeddings.qEmbCentroid(spark, Sf0001)
      .select($"label", $"c0").as[(Int, Double)].collect().toMap
    val manual = graft.sources.Tables.embeddings(spark, Sf0001)
      .select($"label", element_at($"embedding".cast("array<double>"), 1).as("x"))
      .groupBy($"label")
      .agg((sum($"x".cast("decimal(28,12)")).cast("double") / count(lit(1))).as("m"))
      .as[(Int, Double)].collect().toMap
    manual.foreach { case (l, m) => assert(math.abs(c(l) - m) < 1e-6) }
  }

  test("cdc_chunks: boundaries are content-defined — a prefix edit leaves every later chunk hash unchanged") {
    val base = (0 until 240).map(i => s"w$i").mkString(" ")
    val edited = "inserted prefix tokens " + base
    val chunks = Corpus.cdcChunks(
        Seq((1L, base), (2L, edited)).toDF("doc_id", "text"))
      .orderBy($"doc_id", $"chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val h1 = chunks.filter(_._1 == 1L).map(_._2).toSeq
    val h2 = chunks.filter(_._1 == 2L).map(_._2).toSeq
    assert(h1.size > 2, "240 tokens at expected length 16 must cut several chunks")
    // the fixed-window encoding (qChunkDocs) shifts EVERY chunk under a
    // prefix edit; CDC must preserve everything after the first
    // surviving boundary: doc1's tail is a suffix of doc2's hashes
    val tail1 = h1.drop(1)
    assert(h2.takeRight(tail1.size) == tail1,
      "all chunks after the first boundary must be byte-identical")
    // mass conservation: chunk token counts sum to the token count
    val sums = Corpus.cdcChunks(Seq((1L, base)).toDF("doc_id", "text"))
      .agg(sum($"n_tokens")).head.getLong(0)
    assert(sums == 240L)
  }

  test("cdc_chunks gate: per-doc indices dense from 0, n_tokens positive, hash deterministic") {
    val df = Corpus.qCdcChunks(spark, Sf0001).cache()
    try {
      assert(df.filter($"n_tokens" <= 0).isEmpty)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"doc_id").orderBy($"chunk_idx")
      assert(df.withColumn("rk", row_number().over(w) - 1)
        .filter($"rk" =!= $"chunk_idx").isEmpty)
      // identical runs produce identical hashes (pure content function)
      val again = Corpus.qCdcChunks(spark, Sf0001)
      assert(df.exceptAll(again).isEmpty)
    } finally df.unpersist()
  }
}
