package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Hashing
import graft.sources.Tables

/**
 * Text-analysis operators for a training-data pipeline (driver-mandated
 * extension surface; reference analogue is the tokenizer flatMap at
 * examples/word_count.py:13-25).
 *
 * Everything here is per-row Catalyst expression work — no UDFs, no
 * shuffles except the explicit aggregations — so each operator scans,
 * computes inside whole-stage codegen, and reduces with map-side
 * partial aggregation. At 100 TB the scans are the cost; nothing here
 * adds a second pass over the data.
 */
object TextOps {
  import Relational.ColInterp

  /** Stopword list shared with the DuckDB oracle (subset of the
    * synthetic vocab; stands in for a real language list). */
  val Stopwords: Seq[String] = Seq("the", "a")

  private val DEC = DecimalType(18, 6)

  private def toks: Column = Hashing.tokens($"text")

  /** Occurrences of stopwords in token array `t`, lambda-free:
    * size minus size-after-removal (array_remove drops every
    * occurrence) — stays out of interpreted higher-order-function
    * eval, which dominates per-token cost on a large corpus. */
  private def stopwordCount(t: Column): Column =
    size(t) - size(Stopwords.foldLeft(t)((c, w) => array_remove(c, w)))

  /** Exact round-half-up to `s` decimal places, computed on decimals so
    * the DuckDB oracle (which rounds the same way) hash-matches. */
  private def r6(c: Column): Column = c.cast(DecimalType(28, 12)).cast(DEC).cast("double")

  // ------------------------------------------------------------------
  // P4/A1: word count — the reference's flagship flatMap + keyed agg
  // (tokenize, explode, count per word). Map-side combine means the
  // shuffle carries |vocab| partials per partition, not tokens.
  // ------------------------------------------------------------------
  def qWordCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"word")

  val sqlWordCount: String =
    s"""SELECT word, count(*) AS cnt
       |FROM (SELECT unnest(${Hashing.sqlTokens("text")}) AS word FROM documents)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Token counting + quality scoring: per-doc token count, distinct
  // count, avg token length, stopword ratio, and a composite quality
  // score — the standard pre-training corpus filters.
  // ------------------------------------------------------------------
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    // Tokenize ONCE into a named column; the stats projection reads the
    // attribute (Catalyst's CollapseProject keeps multi-referenced
    // non-trivial aliases in their own projection, so the split/lower
    // pass runs once per row, not once per output column).
    val t = $"t"
    // NULLIF-guarded denominators: Spark's non-ANSI x/0 yields NULL but
    // DuckDB yields Inf — NULLIF on both sides pins the divergent case
    // to NULL = NULL (empty docs only; benign but gate-exact).
    val nTok = nullif(size(t), lit(0))
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select(
        $"doc_id",
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        r6(length(concat_ws("", t)).cast("double") / nTok).as("avg_token_len"),
        r6(stopwordCount(t).cast("double") / nTok).as("stopword_ratio"))
      .withColumn("type_token_ratio",
        r6($"n_distinct".cast("double") / nullif($"n_tokens", lit(0L))))
      .orderBy($"doc_id")
  }

  val sqlTextStats: String = {
    val t = Hashing.sqlTokens("text")
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    val r = (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"
    s"""SELECT doc_id,
       |  len($t)::BIGINT AS n_tokens,
       |  len(list_distinct($t))::BIGINT AS n_distinct,
       |  ${r(s"length(list_aggregate($t, 'string_agg', ''))::DOUBLE / NULLIF(len($t), 0)")} AS avg_token_len,
       |  ${r(s"len(list_filter($t, w -> w IN ($sw)))::DOUBLE / NULLIF(len($t), 0)")} AS stopword_ratio,
       |  ${r(s"len(list_distinct($t))::DOUBLE / NULLIF(len($t), 0)")} AS type_token_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Language-ID heuristic: score per-doc character/stopword features
  // and classify. The synthetic corpus is ASCII so the interesting
  // output is the feature vector + rule decision (deterministic, and
  // the shape matches a real char-ngram classifier: one scan,
  // per-row math, no shuffle).
  // ------------------------------------------------------------------
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val t = $"t"
    val asciiRatio = length(regexp_replace($"text", "[^\\x00-\\x7F]", ""))
      .cast("double") / nullif(length($"text"), lit(0))
    val swRatio = stopwordCount(t).cast("double") / nullif(size(t), lit(0))
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", $"lang", $"text", toks.as("t"))
      .select($"doc_id", $"lang".as("labeled_lang"),
        r6(asciiRatio).as("ascii_ratio"), r6(swRatio).as("stopword_ratio"))
      .withColumn("predicted_lang",
        when($"ascii_ratio" < 0.7, lit("non-latin"))
          .when($"stopword_ratio" >= 0.03, lit("en"))
          .otherwise(lit("und")))
      .orderBy($"doc_id")
  }

  val sqlLangId: String = {
    val t = Hashing.sqlTokens("text")
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    val r = (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"
    val ar = "length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))::DOUBLE / NULLIF(length(text), 0)"
    val swr = s"len(list_filter($t, w -> w IN ($sw)))::DOUBLE / NULLIF(len($t), 0)"
    s"""SELECT doc_id, lang AS labeled_lang,
       |  ${r(ar)} AS ascii_ratio,
       |  ${r(swr)} AS stopword_ratio,
       |  CASE WHEN ${r(ar)} < 0.7 THEN 'non-latin'
       |       WHEN ${r(swr)} >= 0.03 THEN 'en'
       |       ELSE 'und' END AS predicted_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Token counting, whitespace + BPE-ish: the two standard corpus size
  // estimators. The BPE-ish pre-tokenizer splits into letter runs,
  // digit runs, and single punctuation marks (the GPT-2-style
  // pre-tokenization shape), all as one codegen'd regexp pass.
  // ------------------------------------------------------------------
  private[operators] val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", length($"text").cast("long").as("n_chars"),
        size(Hashing.tokens($"text")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text", lit(BpeIshPattern), lit(0))).cast("long")
          .as("bpe_tokens"))
      .withColumn("chars_per_token",
        r6($"n_chars".cast("double") / nullif($"bpe_tokens", lit(0L))))
      .orderBy($"doc_id")

  val sqlTokenCount: String =
    s"""SELECT doc_id, length(text)::BIGINT AS n_chars,
       |  len(${Hashing.sqlTokens("text")})::BIGINT AS ws_tokens,
       |  len(regexp_extract_all(text, '$BpeIshPattern'))::BIGINT AS bpe_tokens,
       |  CAST(round(CAST(length(text)::DOUBLE /
       |    NULLIF(len(regexp_extract_all(text, '$BpeIshPattern')), 0) AS DECIMAL(28,12)), 6) AS DOUBLE) AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Document fingerprinting: content-hash (sha256 of normalized text)
  // + order-sensitive rolling polynomial hash over token h60s
  // (mod 2^40 so the accumulator can never overflow int64 in either
  // engine — DuckDB throws on BIGINT overflow, Spark wraps).
  // ------------------------------------------------------------------
  private val RollMod = 1099511627776L // 2^40

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select(
        $"doc_id",
        sha2(concat_ws(" ", $"t"), 256).as("content_hash"),
        aggregate(transform($"t", c => Hashing.h60(c)), lit(0L),
          (acc, h) => (acc * 31 + h) % RollMod).as("rolling_hash"))
      .orderBy($"doc_id")

  val sqlFingerprint: String = {
    val t = Hashing.sqlTokens("text")
    s"""SELECT doc_id,
       |  sha256(coalesce(list_aggregate($t, 'string_agg', ' '), '')) AS content_hash,
       |  list_reduce([0::BIGINT] || list_transform($t, w -> ${Hashing.sqlH60("w")}),
       |              (acc, h) -> (acc * 31 + h) % $RollMod) AS rolling_hash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // TF-IDF: top-3 most distinguishing terms per document. Term
  // frequencies aggregate map-side (shuffle carries per-partition
  // partials, not tokens); document frequency is a second aggregate
  // over the (doc, term) pairs; the corpus size joins in as a
  // broadcast scalar. The idf factor is the rational n_docs/df rather
  // than its logarithm: log is monotone, so per-document ranking is
  // identical, and a single integer-multiply + IEEE divide is
  // bit-reproducible across engines (libm log implementations are
  // not). Ranking is bounded per doc (row_number ≤ 3 ⇒ WindowGroupLimit
  // keeps the sort top-k, never full per-doc term lists).
  // ------------------------------------------------------------------
  val TfidfTopK = 3

  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSharded(spark, dir)
    val tf = docs.select($"doc_id", explode(toks).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // df as a whole-partition window count over the (doc, term) rows:
    // one shuffle on term, no second aggregate and no term-keyed join.
    val wDf = Window.partitionBy($"term")
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(total))
      .withColumn("score", ($"tf" * $"n_docs").cast("double") / $"df")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= TfidfTopK)
      .select($"doc_id", $"term", $"tf", $"df", $"score", $"rk")
      .orderBy($"doc_id", $"rk")
  }

  val sqlTfidf: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Hashing.sqlTokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df, (tf * n_docs)::DOUBLE / df AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tf, df, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
       |  FROM scored)
       |SELECT doc_id, term, tf, df, score, rk FROM ranked
       |WHERE rk <= $TfidfTopK ORDER BY doc_id, rk""".stripMargin

  // ------------------------------------------------------------------
  // BM25 retrieval (Robertson–Spärck Jones, k1 = 1.2, b = 0.75): top-5
  // documents per query over the corpus — the retrieval face of a
  // training-data pipeline (eval-set mining, RAG passage ranking).
  // Queries are derived deterministically from the corpus itself (the
  // first QueryLen tokens of each doc_id < NumQueries document).
  //
  // Cross-engine float law: idf is the log-free rational
  // (2N − 2df + 1)/(2df + 1) — same ordering intuition as the
  // +0.5-smoothed Robertson idf, always positive, no libm. Clearing
  // k1/b denominators by 10·T turns each per-term score into a ratio
  // of two EXACT integer products (all < 2^53 at gate scale):
  //   score = qtf·(2N−2df+1)·22·tf·T
  //         / [(2df+1)·(10·tf·T + 3·T + 9·dl·N)]
  // — one correctly-rounded IEEE division, bit-identical in both
  // engines. The per-(query, doc) sum over matched terms is the strict
  // term-ordered left fold mirrored by [[Similarity.sqlFsum]]. (At a
  // real 100 TB corpus the integer products outgrow 2^53: there you
  // freeze N, T, avgdl as published corpus constants — the idf table
  // is a broadcast dimension either way.)
  //
  // Scale shape: tf is one map-side-combined aggregate over the token
  // explode, with dl riding the explode (constant per group, recovered
  // by max — no doc-keyed window); df is the one term-keyed window over
  // the slim (doc, term) partials — never raw tokens; the query table
  // is tiny and broadcast, so scoring adds no shuffle; only matched
  // (query, doc, term) hits reach the final aggregation.
  // ------------------------------------------------------------------
  val NumQueries = 8
  val QueryLen = 6
  val Bm25TopK = 5

  /** BM25 core over arbitrary retrieval units `(pid, t)` — the same
    * ranking serves whole documents ([[qBm25]]) and chunk-grid
    * passages ([[qPassageBm25]], the RAG retrieval unit). All float-law
    * notes above apply; `queries` is the tiny broadcast (query_id,
    * term, qtf) frame. */
  def bm25TopK(units0: DataFrame, queries: DataFrame, k: Int,
      materializeUnits: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `totals` and `tf` both consume the units, so an expensive unit
    // grid (the passage face's chunk-slice explode) is persisted once
    // (the ssjoinPairs stance). The flag exists because a persisted
    // DOC-level unit grid is a canonical PREFIX of several one-scan
    // queries' plans — the CacheManager would substitute it into them,
    // breaking their fused single-scan shape (PlanSpec pins) for a
    // subtree (plain tokenize) that is cheap to recompute anyway.
    val units =
      if (materializeUnits) {
        val u = graft.core.Scratch.persist(units0); u.count(); u
      } else units0
    val totals = units.agg(
      count(lit(1)).cast("long").as("nd"),
      sum(size($"t")).cast("long").as("tt"))
    // dl rides the explode so no unit-keyed window shuffle is needed:
    // it's constant within the (pid, term) group, recovered by max
    val tf = units.select($"pid", size($"t").cast("long").as("dl"),
        explode($"t").as("term"))
      .groupBy($"pid", $"term")
      .agg(count(lit(1)).cast("long").as("tf"), max($"dl").as("dl"))
    val stats = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"term")).cast("long"))
    val num = $"qtf" * (lit(2L) * $"nd" - lit(2L) * $"df" + lit(1L)) *
      lit(22L) * $"tf" * $"tt"
    val den = (lit(2L) * $"df" + lit(1L)) *
      (lit(10L) * $"tf" * $"tt" + lit(3L) * $"tt" + lit(9L) * $"dl" * $"nd")
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"pid")
    stats.join(broadcast(queries), "term").crossJoin(broadcast(totals))
      .select($"query_id", $"pid", $"term",
        (num.cast("double") / den.cast("double")).as("s"))
      .groupBy($"query_id", $"pid")
      .agg(
        count(lit(1)).cast("long").as("n_terms"),
        aggregate(sort_array(collect_list(struct($"term", $"s"))),
          lit(0.0), (acc, x) => acc + x("s")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
  }

  /** The corpus-derived query-term frame shared by both BM25 faces
    * (and the RRF fusion in [[Similarity]]). */
  private[operators] def bm25Queries(docs: DataFrame): DataFrame =
    docs.filter($"doc_id" < NumQueries)
      .select($"doc_id".as("query_id"), explode(slice($"t", 1, QueryLen)).as("term"))
      .groupBy($"query_id", $"term").agg(count(lit(1)).cast("long").as("qtf"))

  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select($"doc_id", toks.as("t"))
    bm25TopK(docs.select($"doc_id".as("pid"), $"t"), bm25Queries(docs), Bm25TopK)
      .select($"query_id", $"rank", $"pid".as("doc_id"), $"score", $"n_terms")
      .orderBy($"query_id", $"rank")
  }

  // ------------------------------------------------------------------
  // Passage retrieval: BM25 over the X20 chunk grid (ChunkSize-token
  // windows every ChunkStride) — the unit a RAG pipeline actually
  // retrieves. Same core, same scale shape; passage ids pack
  // (doc_id, start) so the ranking shuffles one long, decoded only in
  // the presentation projection.
  // ------------------------------------------------------------------
  val PassageTopK = 3
  val PassageIdBase = 1000L

  def qPassageBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select($"doc_id", toks.as("t"))
    val passages = docs
      .select($"doc_id",
        explode(sequence(lit(1), greatest(size($"t"), lit(1)),
          lit(Corpus.ChunkStride))).as("s"), $"t")
      .select(($"doc_id" * PassageIdBase + $"s").as("pid"),
        slice($"t", $"s", lit(Corpus.ChunkSize)).as("t"))
    bm25TopK(passages, bm25Queries(docs), PassageTopK, materializeUnits = true)
      .select($"query_id", $"rank",
        expr(s"pid div $PassageIdBase").as("doc_id"),
        ($"pid" % PassageIdBase).as("start"), $"score", $"n_terms")
      .orderBy($"query_id", $"rank")
  }

  val sqlPassageBm25: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents),
       |p AS (
       |  SELECT doc_id * $PassageIdBase + s AS pid,
       |    list_slice(t, s, s + ${Corpus.ChunkSize - 1}) AS t
       |  FROM (SELECT doc_id, t,
       |          unnest(range(1, greatest(len(t), 1) + 1, ${Corpus.ChunkStride})) AS s
       |        FROM tok)),
       |n AS (SELECT count(*)::BIGINT AS nd, sum(len(t))::BIGINT AS tt FROM p),
       |tf AS (
       |  SELECT pid, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
       |  FROM (SELECT pid, len(t)::BIGINT AS dl, unnest(t) AS term FROM p)
       |  GROUP BY 1, 2),
       |stats AS (
       |  SELECT pid, term, tf, dl,
       |    (count(*) OVER (PARTITION BY term))::BIGINT AS df
       |  FROM tf),
       |q AS (
       |  SELECT query_id, term, count(*)::BIGINT AS qtf
       |  FROM (SELECT doc_id AS query_id, unnest(list_slice(t, 1, $QueryLen)) AS term
       |        FROM tok WHERE doc_id < $NumQueries) GROUP BY 1, 2),
       |hit AS (
       |  SELECT query_id, s.pid, s.term,
       |    (qtf * (2 * nd - 2 * df + 1) * 22 * tf * tt)::DOUBLE
       |      / ((2 * df + 1) * (10 * tf * tt + 3 * tt + 9 * dl * nd))::DOUBLE AS s
       |  FROM stats s JOIN q USING (term) CROSS JOIN n),
       |agg AS (
       |  SELECT query_id, pid, count(*)::BIGINT AS n_terms,
       |    ${Similarity.sqlFsum(s"list(s ORDER BY term)")} AS score
       |  FROM hit GROUP BY 1, 2)
       |SELECT query_id, rank, pid // $PassageIdBase AS doc_id,
       |  pid % $PassageIdBase AS start, score, n_terms FROM (
       |  SELECT query_id, pid, score, n_terms,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, pid) AS rank
       |  FROM agg)
       |WHERE rank <= $PassageTopK ORDER BY query_id, rank""".stripMargin
  }

  val sqlBm25: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents),
       |n AS (SELECT count(*)::BIGINT AS nd, sum(len(t))::BIGINT AS tt FROM tok),
       |tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
       |  FROM (SELECT doc_id, len(t)::BIGINT AS dl, unnest(t) AS term FROM tok)
       |  GROUP BY 1, 2),
       |stats AS (
       |  SELECT doc_id, term, tf, dl,
       |    (count(*) OVER (PARTITION BY term))::BIGINT AS df
       |  FROM tf),
       |q AS (
       |  SELECT query_id, term, count(*)::BIGINT AS qtf
       |  FROM (SELECT doc_id AS query_id, unnest(list_slice(t, 1, $QueryLen)) AS term
       |        FROM tok WHERE doc_id < $NumQueries) GROUP BY 1, 2),
       |hit AS (
       |  SELECT query_id, s.doc_id, s.term,
       |    (qtf * (2 * nd - 2 * df + 1) * 22 * tf * tt)::DOUBLE
       |      / ((2 * df + 1) * (10 * tf * tt + 3 * tt + 9 * dl * nd))::DOUBLE AS s
       |  FROM stats s JOIN q USING (term) CROSS JOIN n),
       |agg AS (
       |  SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
       |    ${Similarity.sqlFsum(s"list(s ORDER BY term)")} AS score
       |  FROM hit GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score, n_terms FROM (
       |  SELECT query_id, doc_id, score, n_terms,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM agg)
       |WHERE rank <= $Bm25TopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // Quality-classifier scoring: a FROZEN linear model over the per-doc
  // text-stat features, ranking documents by logit — the
  // classifier-based filtering step of GPT-3-style data prep (Brown et
  // al. 2020 §A: a trained quality classifier scores every crawl
  // document; docs are kept by score). The weights here are fixed
  // constants standing in for a trained model's — the ENGINE face
  // (one scan, per-row fused multiply-adds, no shuffle) is what's
  // under test, exactly as Multimodal stubs its decoder. Float law:
  // features are 6-decimal-rounded doubles, weights are literals both
  // engines parse to the same binary64, and the logit is the same
  // left-associated chain of IEEE mults/adds in both engines — no
  // sigmoid (exp is monotone, so thresholding the logit IS
  // thresholding the probability, and no libm enters the gate).
  // ------------------------------------------------------------------
  val QwBias = -3.5
  val QwMeanWordLen = 0.45
  val QwStopwordRatio = -3.25
  val QwTypeTokenRatio = 2.5
  val QwLen = 0.5 // applied to n_tokens/256 (power-of-two scale: exact)

  def qQualityLogit(spark: SparkSession, dir: String): DataFrame = {
    val t = $"t"
    val nTok = nullif(size(t), lit(0))
    val base = Tables.documentsSharded(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id",
        size(t).cast("long").as("n_tokens"),
        r6(length(concat_ws("", t)).cast("double") / nTok).as("mean_word_len"),
        r6(stopwordCount(t).cast("double") / nTok).as("stopword_ratio"),
        r6(size(array_distinct(t)).cast("double") / nTok).as("type_token_ratio"))
    val logit =
      lit(QwBias) +
        lit(QwMeanWordLen) * $"mean_word_len" +
        lit(QwStopwordRatio) * $"stopword_ratio" +
        lit(QwTypeTokenRatio) * $"type_token_ratio" +
        lit(QwLen) * ($"n_tokens".cast("double") / 256.0)
    base.withColumn("logit", logit)
      .withColumn("keep", coalesce($"logit" >= 0.0, lit(false)))
      .orderBy($"doc_id")
  }

  val sqlQualityLogit: String = {
    val t = Hashing.sqlTokens("text")
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    val r = (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"
    s"""WITH f AS (
       |  SELECT doc_id,
       |    len($t)::BIGINT AS n_tokens,
       |    ${r(s"length(list_aggregate($t, 'string_agg', ''))::DOUBLE / NULLIF(len($t), 0)")} AS mean_word_len,
       |    ${r(s"len(list_filter($t, w -> w IN ($sw)))::DOUBLE / NULLIF(len($t), 0)")} AS stopword_ratio,
       |    ${r(s"len(list_distinct($t))::DOUBLE / NULLIF(len($t), 0)")} AS type_token_ratio
       |  FROM documents)
       |SELECT doc_id, n_tokens, mean_word_len, stopword_ratio, type_token_ratio,
       |  $QwBias + $QwMeanWordLen * mean_word_len
       |    + $QwStopwordRatio * stopword_ratio
       |    + $QwTypeTokenRatio * type_token_ratio
       |    + $QwLen * (n_tokens::DOUBLE / 256.0) AS logit,
       |  coalesce(($QwBias + $QwMeanWordLen * mean_word_len
       |    + $QwStopwordRatio * stopword_ratio
       |    + $QwTypeTokenRatio * type_token_ratio
       |    + $QwLen * (n_tokens::DOUBLE / 256.0)) >= 0.0, FALSE) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Vocabulary coverage (Zipf audit): the top-K corpus terms by
  // frequency with their cumulative token-mass coverage — the curve
  // that sizes a tokenizer vocabulary (what fraction of all tokens the
  // first k types explain) and flags a degenerate corpus (coverage
  // too concentrated = boilerplate; too flat = noise). Scale shape:
  // term counts aggregate with map-side combine (shuffle carries
  // |vocab| partials, not tokens), the corpus total is a broadcast
  // scalar, the top-K cut is TakeOrderedAndProject (never a full
  // vocab sort materialized), and the running sum is a window over
  // exactly K rows — driver-bounded by construction.
  // ------------------------------------------------------------------
  val VocabTopK = 50

  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documentsSharded(spark, dir)
      .select(explode(toks).as("term"))
      .groupBy($"term").agg(count(lit(1)).cast("long").as("cnt"))
    val total = counts.agg(sum($"cnt").cast("long").as("total_tokens"))
    val top = counts.orderBy($"cnt".desc, $"term").limit(VocabTopK)
    // K rows only: the unpartitioned window is bounded, not a smell
    val w = Window.orderBy($"cnt".desc, $"term")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cnt", sum($"cnt").over(w).cast("long"))
      .withColumn("coverage",
        $"cum_cnt".cast("double") / $"total_tokens".cast("double"))
      .select($"rank", $"term", $"cnt", $"cum_cnt", $"total_tokens", $"coverage")
      .orderBy($"rank")
  }

  val sqlVocabCoverage: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH counts AS (
       |  SELECT term, count(*)::BIGINT AS cnt
       |  FROM (SELECT unnest($t) AS term FROM documents) GROUP BY 1),
       |n AS (SELECT sum(cnt)::BIGINT AS total_tokens FROM counts),
       |top AS (SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT $VocabTopK),
       |r AS (
       |  SELECT term, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, term) AS rank,
       |    sum(cnt) OVER (ORDER BY cnt DESC, term
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_cnt
       |  FROM top)
       |SELECT rank, term, cnt, cum_cnt, total_tokens,
       |  cum_cnt::DOUBLE / total_tokens::DOUBLE AS coverage
       |FROM r CROSS JOIN n ORDER BY rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // Token-length histogram: fixed-width buckets over per-document
  // token counts, with doc and token mass per bucket — the
  // distribution that drives sequence-packing and batch-size planning
  // (how much of the corpus fits a context window; where truncation
  // bites). One scan, integral-exact bucket edges, tiny map-side-
  // combined aggregate: the cheapest possible shape at any corpus
  // size.
  // ------------------------------------------------------------------
  val HistBucketWidth = 16L
  val HistMaxBucket = 31L

  def qLengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(size(toks).cast("long").as("n_tokens"))
      .select($"n_tokens",
        least(expr(s"n_tokens div $HistBucketWidth"), lit(HistMaxBucket))
          .as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
      .select($"bucket", ($"bucket" * HistBucketWidth).as("bucket_lo"),
        $"n_docs", $"total_tokens")
      .orderBy($"bucket")

  val sqlLengthHistogram: String = {
    val n = s"len(${Hashing.sqlTokens("text")})"
    s"""SELECT bucket, bucket * $HistBucketWidth AS bucket_lo,
       |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
       |FROM (SELECT $n::BIGINT AS n_tokens,
       |        least($n // $HistBucketWidth, $HistMaxBucket) AS bucket
       |      FROM documents)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // Inverted-index build: the retrieval artifact itself — per term its
  // document frequency, collection frequency, and the head of its
  // postings list ((doc:tf) pairs, tf-descending) — what an IR system
  // materializes once and serves forever (BM25 here derives the same
  // (term, doc, tf) grid on the fly; a production index writes it
  // out). Scale shape: tf aggregates on (term, doc) with map-side
  // combine; the per-term window and the final per-term aggregate
  // share one hash partitioning on term (a single exchange feeds
  // both); the postings head is rank-bounded BEFORE the list is
  // assembled, so no full postings array is ever built just to be
  // truncated. At 100 TB the full postings would stream to a sorted
  // writer instead of a head string — the grid and its partitioning
  // are the same.
  // ------------------------------------------------------------------
  val PostingsHead = 5

  def qInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documentsSharded(spark, dir)
      .select($"doc_id", explode(toks).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).cast("long").as("tf"))
    val w = Window.partitionBy($"term").orderBy($"tf".desc, $"doc_id")
    tf.withColumn("rk", row_number().over(w))
      .groupBy($"term")
      .agg(
        count(lit(1)).cast("long").as("df"),
        sum($"tf").cast("long").as("cf"),
        array_join(
          transform(
            array_sort(collect_list(
              when($"rk" <= PostingsHead, struct($"rk", $"doc_id", $"tf")))),
            e => concat_ws(":", e.getField("doc_id"), e.getField("tf"))),
          ",").as("postings_head"))
      .orderBy($"term")
  }

  val sqlInvertedIndex: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH tf AS (
       |  SELECT term, doc_id, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest($t) AS term FROM documents)
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT term, doc_id, tf,
       |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rk
       |  FROM tf)
       |SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf,
       |  string_agg(CASE WHEN rk <= $PostingsHead
       |    THEN doc_id || ':' || tf END, ',' ORDER BY rk) AS postings_head
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // BPE merge-pair counting (Sennrich et al. 2016 §3.2, the inner loop
  // of byte-pair-encoding tokenizer training): word types with corpus
  // frequencies, each word spelled as characters plus an end-of-word
  // marker '_', and every adjacent symbol pair counted weighted by the
  // word's frequency — the top pair is the next BPE merge. One
  // iteration only (the full trainer re-runs this grid after each
  // merge; every iteration has this exact shape). Scale shape: the
  // corpus scan reduces to the word-type frequency table first
  // (map-side combine — pairs are then generated from |vocab| rows,
  // not from every token occurrence), pair explosion is per-row
  // codegen, and the pair aggregate is map-side combined; the top-K
  // cut is TakeOrderedAndProject. All counts exact integers.
  // ------------------------------------------------------------------
  val BpeTopPairs = 20

  def qBpePairs(spark: SparkSession, dir: String): DataFrame = {
    val wordFreq = Tables.documentsSharded(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy($"word").agg(count(lit(1)).cast("long").as("freq"))
    val marked = concat($"word", lit("_"))
    wordFreq
      .select($"word", $"freq",
        explode(transform(sequence(lit(1), length($"word")),
          i => marked.substr(i, lit(2)))).as("pair"))
      .groupBy($"pair")
      .agg(sum($"freq").cast("long").as("pair_count"),
        countDistinct($"word").cast("long").as("n_word_types"))
      .orderBy($"pair_count".desc, $"pair")
      .limit(BpeTopPairs)
  }

  val sqlBpePairs: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH wf AS (
       |  SELECT word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest($t) AS word FROM documents) GROUP BY 1),
       |p AS (
       |  SELECT word, freq,
       |    unnest(list_transform(range(1, len(word) + 1),
       |      i -> substr(word || '_', i::INTEGER, 2))) AS pair
       |  FROM wf)
       |SELECT pair, sum(freq)::BIGINT AS pair_count,
       |  count(DISTINCT word)::BIGINT AS n_word_types
       |FROM p GROUP BY 1
       |ORDER BY pair_count DESC, pair LIMIT $BpeTopPairs""".stripMargin
  }

  // ------------------------------------------------------------------
  // BPE encoding with a frozen merge table: apply the learned merges
  // in rank order to every word (symbols start as characters plus the
  // end-of-word marker) and report per-document symbol counts before/
  // after — the tokenizer-application step, and the fertility number
  // (symbols per word) that prices a tokenizer against a corpus. The
  // merge table is FROZEN (the [[IvfGateCentroids]] stance: a real
  // trainer re-derives it via [[qBpePairs]] iterations; the gate pins
  // an artifact) — entries are (left, right) symbol pairs in rank
  // order, later merges consuming earlier outputs ("e r"→"er", then
  // "er _"→"er_"). Replace-all on the space-separated symbol string
  // is left-to-right non-overlapping in both engines, so the encoding
  // is deterministic and identical. Scale shape: pure per-row
  // expression work inside one scan — the merge chain is a fixed
  // composition of string replaces, no shuffle, no state.
  // ------------------------------------------------------------------
  val BpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("er", "_"), ("i", "n"), ("o", "w"), ("s", "t"))

  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    def encodedLen(w: Column): Column = {
      val spaced = trim(regexp_replace(concat(w, lit("_")), "(.)", "$1 "))
      val merged = BpeMerges.foldLeft(spaced) { case (r, (a, b)) =>
        replace(r, lit(s"$a $b"), lit(s"$a$b"))
      }
      size(split(merged, " ")).cast("long")
    }
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id",
        size($"t").cast("long").as("n_words"),
        aggregate($"t", lit(0L), (acc, w) => acc + (length(w) + 1).cast("long"))
          .as("syms_before"),
        aggregate($"t", lit(0L), (acc, w) => acc + encodedLen(w))
          .as("syms_after"))
      .withColumn("fertility",
        $"syms_after".cast("double") / $"n_words".cast("double"))
      .orderBy($"doc_id")
  }

  val sqlBpeEncode: String = {
    val t = Hashing.sqlTokens("text")
    val spaced = "trim(regexp_replace(w || '_', '(.)', '\\1 ', 'g'))"
    val merged = BpeMerges.foldLeft(spaced) { case (r, (a, b)) =>
      s"replace($r, '$a $b', '$a$b')"
    }
    s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents)
       |SELECT doc_id, len(t)::BIGINT AS n_words,
       |  list_sum(list_transform(t, w -> len(w) + 1))::BIGINT AS syms_before,
       |  list_sum(list_transform(t, w ->
       |    len(string_split($merged, ' '))))::BIGINT AS syms_after,
       |  list_sum(list_transform(t, w -> len(string_split($merged, ' '))))::DOUBLE /
       |    len(t)::DOUBLE AS fertility
       |FROM tok ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Full BPE trainer loop (Sennrich et al. 2016 §3.2's actual
  // algorithm): alternate count→merge for K rounds to PRODUCE the
  // merge table [[qBpeEncode]] consumes — [[qBpePairs]] is one
  // iteration of the count half; this runs the whole loop. Round k:
  // count adjacent symbol pairs over the word-type table weighted by
  // corpus frequency, elect the argmax (count desc, then lexicographic
  // — deterministic), rewrite every spelling with that merge applied
  // (left-to-right non-overlapping `replace`, the exact application
  // semantics of [[qBpeEncode]], so train and encode compose). Scale
  // shape: the corpus scan reduces to the word-type frequency table
  // ONCE (map-side combine); all K iterations run over that |vocab|-
  // sized store — each materialized eagerly (persist + count, the
  // [[Embeddings]] index-build stance) so round k+1 reads round k
  // instead of recomputing the chain — and each round's elected merge
  // is read back as one scalar row — the bounded per-round driver
  // read [[Clustering.connectedComponents]]'s convergence sum already
  // establishes (K rows total, independent of corpus size; NOT a
  // collect over data) — and applied as a literal rewrite, so the
  // vocab lineage grows by one projection per round (an earlier
  // crossJoin-the-election formulation embedded the previous round's
  // plan twice per round: exponential analysis cost by round 8). At
  // 100 TB only the initial reduction sees the corpus; trainer cost is
  // K small aggregates over the vocabulary, independent of corpus
  // row count. The returned frame is the K-row merge table — a local
  // relation, the trained artifact itself.
  // ------------------------------------------------------------------
  val BpeTrainRounds = 8

  def qBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val spelled = trim(regexp_replace(concat($"word", lit("_")), "(.)", "$1 "))
    val base = graft.core.Scratch.persist(Tables.documentsSharded(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy($"word").agg(count(lit(1)).cast("long").as("freq"))
      .select(spelled.as("sp"), $"freq"))
    base.count() // the one corpus-sized reduction
    // Round k's vocab is the persisted base with k−1 literal replace()
    // projections chained on top — LINEAR lineage (one Project per
    // round; the exponential blowup warned about above came from a
    // crossJoin-the-election shape embedding the previous plan twice,
    // not from chaining). Each election therefore re-applies ≤ K
    // replaces over the |vocab|-row cache — K²/2 cheap row-local
    // rewrites total — in exchange for dropping a persist + count
    // materialization per round (2 jobs each): a modest measured win at
    // sf0.1, where the vocab is tiny either way. At 100 TB the trade
    // holds: the corpus is touched once by the base reduction either
    // way, and the K² rewrites run over the vocabulary, not the corpus.
    var vocab: DataFrame = base
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    (1 to BpeTrainRounds).foreach { k =>
      val syms = split($"sp", " ")
      val best = vocab
        .select($"freq", explode(transform(
          sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("l"),
            element_at(syms, i + 1).as("r")))).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"freq").cast("long").as("pair_count"))
        .orderBy($"pair_count".desc, $"lhs", $"rhs")
        .limit(1)
        .head() // the elected merge: one bounded scalar row per round
      val (l, r) = (best.getString(0), best.getString(1))
      merges += ((k.toLong, l, r, best.getLong(2)))
      vocab = vocab
        .select(replace($"sp", lit(s"$l $r"), lit(s"$l$r")).as("sp"), $"freq")
    }
    base.unpersist()
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    merges.result().toDF("rank", "lhs", "rhs", "pair_count")
      .orderBy($"rank")
  }

  val sqlBpeTrain: String = {
    val t = Hashing.sqlTokens("text")
    val rounds = (1 to BpeTrainRounds).map { k =>
      s"""p$k AS (
         |  SELECT (pr).l AS lhs, (pr).r AS rhs, sum(freq)::BIGINT AS pair_count
         |  FROM (SELECT freq,
         |      unnest(list_transform(range(1, len(syms)),
         |        i -> {'l': syms[i], 'r': syms[i + 1]})) AS pr
         |    FROM (SELECT freq, string_split(sp, ' ') AS syms FROM v${k - 1}))
         |  GROUP BY 1, 2),
         |b$k AS (SELECT $k::BIGINT AS rank, lhs, rhs, pair_count
         |  FROM p$k ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |v$k AS (SELECT replace(sp, lhs || ' ' || rhs, lhs || rhs) AS sp, freq
         |  FROM v${k - 1}, b$k)""".stripMargin
    }.mkString(",\n")
    val union = (1 to BpeTrainRounds)
      .map(k => s"SELECT * FROM b$k").mkString(" UNION ALL ")
    s"""WITH wf AS (
       |  SELECT word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest($t) AS word FROM documents) GROUP BY 1),
       |v0 AS (SELECT trim(regexp_replace(word || '_', '(.)', '\\1 ', 'g')) AS sp,
       |  freq FROM wf),
       |$rounds
       |SELECT rank, lhs, rhs, pair_count FROM ($union) ORDER BY rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // Frozen n-gram LM quality score — the CCNet stance (Wenzek et al.
  // 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  // Web Crawl Data": score every raw document under a language model
  // trained on a trusted reference corpus; keep the head). The model
  // here is a HASHED bigram LM (Talbot & Osborne 2007's randomized
  // n-gram LM stance, and the same hashed-feature device as
  // [[Sampling.qDsirWeights]]): reference slice = doc_id ≡ LmRefRem
  // (mod LmRefMod) — the held-out-slice device decontamination uses —
  // bigram occurrences bucketed to LmBigramBuckets and their contexts
  // (first token) to LmCtxBuckets, add-one smoothing over the bigram
  // bucket space. Per-occurrence probability
  //   p = (n2[bb] + 1) / (n1[cb] + LmBigramBuckets)
  // and the doc score is mean p. Deviation from CCNet, by the repo's
  // cross-engine float law: no perplexity exponent and no libm log —
  // each p is one IEEE divide of exact integers, rounded to
  // DECIMAL(28,12) and decimal-summed (order-free), and the mean is a
  // single further divide; ranking is the same monotone order a
  // log-mean would give on per-doc geometric vs arithmetic tails close
  // enough for a keep/drop filter, and it is reproducible bit-for-bit.
  // Scale shape: both count tables are bounded by their bucket space
  // (≤ 65 536 rows — broadcast), so scoring is one corpus scan + a
  // slim (doc_id, decimal partial) map-side-combined shuffle; the
  // reference aggregation is itself one bounded-key shuffle.
  // ------------------------------------------------------------------
  val LmRefMod = 20L
  val LmRefRem = 3L
  val LmCtxBuckets = 8192L
  val LmBigramBuckets = 65536L
  val LmKeepThreshold = 4.0e-5

  def qLmScore(spark: SparkSession, dir: String): DataFrame = {
    val DEC28 = DecimalType(28, 12)
    val grams = Tables.documentsSharded(spark, dir)
      .select($"doc_id",
        explode_outer(Hashing.wordShingles(Hashing.tokens($"text"), 2)).as("g"))
      .select($"doc_id",
        pmod(Hashing.h60(substring_index($"g", " ", 1)), lit(LmCtxBuckets)).as("cb"),
        pmod(Hashing.h60($"g"), lit(LmBigramBuckets)).as("bb"))
    val isRef = $"doc_id" % LmRefMod === LmRefRem
    val big = grams.filter(isRef).where($"bb".isNotNull)
      .groupBy($"bb").agg(count(lit(1)).as("n2"))
    val ctx = grams.filter(isRef).where($"cb".isNotNull)
      .groupBy($"cb").agg(count(lit(1)).as("n1"))
    val p = when($"bb".isNotNull,
      ((coalesce($"n2", lit(0L)) + 1).cast("double") /
        (coalesce($"n1", lit(0L)) + LmBigramBuckets).cast("double")).cast(DEC28))
    val mean = coalesce(sum(p), lit(0).cast(DEC28)).cast("double") /
      greatest(count($"bb"), lit(1L)).cast("double")
    grams.filter(!isRef)
      .join(broadcast(big), Seq("bb"), "left")
      .join(broadcast(ctx), Seq("cb"), "left")
      .groupBy($"doc_id").agg(
        count($"bb").as("n_bigrams"),
        count(when($"n2".isNotNull, lit(1))).cast("long").as("n_seen"),
        mean.as("lm_score"))
      .select($"doc_id", $"n_bigrams", $"n_seen", $"lm_score",
        ($"lm_score" >= LmKeepThreshold).as("is_kept"))
      .orderBy($"doc_id")
  }

  val sqlLmScore: String = {
    val g = Hashing.sqlShingles(Hashing.sqlTokens("text"), 2)
    val cb = s"${Hashing.sqlH60("split_part(u.g, ' ', 1)")} % $LmCtxBuckets"
    val bb = s"${Hashing.sqlH60("u.g")} % $LmBigramBuckets"
    s"""WITH grams AS (
       |  SELECT doc_id, $cb AS cb, $bb AS bb
       |  FROM (SELECT doc_id, $g AS gs FROM documents) d, unnest(d.gs) AS u(g)),
       |big AS (SELECT bb, count(*) AS n2 FROM grams
       |        WHERE doc_id % $LmRefMod = $LmRefRem GROUP BY 1),
       |ctx AS (SELECT cb, count(*) AS n1 FROM grams
       |        WHERE doc_id % $LmRefMod = $LmRefRem GROUP BY 1),
       |scored AS (
       |  SELECT g.doc_id, count(*) AS n_bigrams,
       |    sum(CASE WHEN big.n2 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_seen,
       |    coalesce(sum(CAST((coalesce(big.n2, 0) + 1)::DOUBLE /
       |        (coalesce(ctx.n1, 0) + $LmBigramBuckets)::DOUBLE AS DECIMAL(28,12))),
       |      0::DECIMAL(28,12)) AS psum
       |  FROM grams g LEFT JOIN big USING (bb) LEFT JOIN ctx USING (cb)
       |  WHERE g.doc_id % $LmRefMod != $LmRefRem
       |  GROUP BY 1),
       |docs AS (SELECT doc_id FROM documents WHERE doc_id % $LmRefMod != $LmRefRem)
       |SELECT d.doc_id, coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       |  coalesce(s.n_seen, 0)::BIGINT AS n_seen,
       |  coalesce(s.psum::DOUBLE / greatest(s.n_bigrams, 1)::DOUBLE, 0.0) AS lm_score,
       |  coalesce(s.psum::DOUBLE / greatest(s.n_bigrams, 1)::DOUBLE, 0.0)
       |    >= $LmKeepThreshold AS is_kept
       |FROM docs d LEFT JOIN scored s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Positional phrase search (Zobel & Moffat 2006, "Inverted files for
  // text search engines" §6: positional postings make multi-word
  // queries exact where bag-of-words retrieval cannot). The classic
  // index formulation joins per-term posting lists on (doc, pos+1);
  // here the match is evaluated WHERE THE TOKENS ALREADY ARE — each
  // document checks the bounded literal phrase set against its own
  // token array in one pass (overlap-correct: "table table table"
  // yields two hits of "table table", which a replace()-count trick
  // would miss). Zero joins, zero shuffle except the presentation
  // sort: at 100 TB this is embarrassingly parallel per-row codegen
  // work, strictly cheaper than shuffling positional postings — the
  // posting-list join shape only wins when the phrase set is dynamic
  // and the corpus is pre-indexed ([[qInvertedIndex]] is that store's
  // build step).
  // ------------------------------------------------------------------
  val PhraseQueries = Seq("table table", "fast scan", "query value", "the row fast")

  /** 1-based start positions of exact phrase `words` in token array
    * `t` (empty when the doc is shorter than the phrase). */
  private def phraseHits(t: Column, words: Seq[String]): Column = {
    val n = words.length
    val cond = (i: Column) =>
      words.zipWithIndex.map { case (wd, j) =>
        element_at(t, (i + lit(j)).cast("int")) === lit(wd)
      }.reduce(_ && _)
    // guard: Spark's sequence(1, stop) REVERSES when stop < 1 (step is
    // inferred as -1), which would index position 0 and throw in ANSI
    when(size(t) >= n, filter(sequence(lit(1), size(t) - (n - 1)), cond))
      .otherwise(array().cast("array<int>"))
  }

  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val matches = PhraseQueries.map { ph =>
      struct(lit(ph).as("phrase"),
        phraseHits($"t", ph.split(" ").toSeq).as("hits"))
    }
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id", explode(array(matches: _*)).as("m"))
      .select($"doc_id", $"m.phrase".as("phrase"),
        size($"m.hits").cast("long").as("n_hits"),
        when(size($"m.hits") > 0, element_at($"m.hits", 1))
          .cast("long").as("first_pos"))
      .filter($"n_hits" > 0)
      .orderBy($"phrase", $"doc_id")
  }

  val sqlPhraseSearch: String = {
    val t = Hashing.sqlTokens("text")
    val legs = PhraseQueries.map { ph =>
      val words = ph.split(" ")
      val n = words.length
      val cond = words.zipWithIndex
        .map { case (wd, j) => s"t[i + $j] = '$wd'" }
        .mkString(" AND ")
      s"""SELECT doc_id, '$ph' AS phrase,
         |    list_filter(range(1, len(t) - ${n - 1} + 1), i -> $cond) AS hits
         |  FROM d""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH d AS (SELECT doc_id, $t AS t FROM documents),
       |h AS (
       |  $legs)
       |SELECT doc_id, phrase, len(hits)::BIGINT AS n_hits,
       |  hits[1]::BIGINT AS first_pos
       |FROM h WHERE len(hits) > 0
       |ORDER BY phrase, doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // PMI collocations (Church & Hanks, CL 1990): the corpus's top
  // bigrams by pointwise mutual information — the classic
  // collocation-extraction / vocab-discovery pass (multi-word units a
  // tokenizer or phrase index should treat as one). The emitted score
  // is the PMI *lift* c12·N/(c1·c2) = p(w1w2)/(p(w1)p(w2)) — monotone
  // in PMI (log of it) but computed as one IEEE divide of exact int64
  // products, so it hash-matches cross-engine where log() would not.
  // Scale shape: two map-side-combined aggregates over slim token /
  // bigram keys (the word-count shape), two word-keyed joins of
  // |vocab|-sized frames, a broadcast 1-row total, and a top-k that
  // runs as TakeOrderedAndProject. The pair-count floor keeps the
  // joined frame to real collocations. int64 headroom: c12·N with
  // N = 5·10⁷ tokens (sf ~1) and c12 ≤ N stays under 2^63 only with
  // the floor applied to c12·N ≤ N² — at true 100 TB scale the lift's
  // N factor moves to a double multiply AFTER the divide (exactness of
  // the ordering is preserved by the shared factor); here both stay
  // exact.
  // ------------------------------------------------------------------
  val PmiTopK = 40
  val PmiMinPair = 3

  def qPmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select(toks.as("t"))
    val uni = docs.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum($"c").as("n_tokens"))
    val bi = docs.select(explode(Hashing.wordShingles($"t", 2)).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("c12"))
      .filter($"c12" >= PmiMinPair)
      .withColumn("w1", element_at(split($"bigram", " "), 1))
      .withColumn("w2", element_at(split($"bigram", " "), 2))
    bi.join(uni.select($"w".as("w1"), $"c".as("c1")), "w1")
      .join(uni.select($"w".as("w2"), $"c".as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        ($"c12" * $"n_tokens").cast("double") / ($"c1" * $"c2").cast("double"))
      .select($"w1", $"w2", $"c12", $"c1", $"c2", $"lift")
      .orderBy($"lift".desc, $"w1", $"w2")
      .limit(PmiTopK)
  }

  val sqlPmiBigrams: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH tok AS (SELECT ${t} AS t FROM documents),
       |uni AS (SELECT w, count(*)::BIGINT AS c
       |  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY 1),
       |n AS (SELECT sum(c)::BIGINT AS n_tokens FROM uni),
       |bi AS (SELECT bg, count(*)::BIGINT AS c12
       |  FROM (SELECT unnest(${Hashing.sqlShingles("t", 2)}) AS bg FROM tok)
       |  GROUP BY 1 HAVING count(*) >= $PmiMinPair),
       |sp AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
       |  c12 FROM bi)
       |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
       |  (c12 * n_tokens)::DOUBLE / (u1.c * u2.c)::DOUBLE AS lift
       |FROM sp JOIN uni u1 ON sp.w1 = u1.w JOIN uni u2 ON sp.w2 = u2.w
       |CROSS JOIN n
       |ORDER BY lift DESC, w1, w2 LIMIT $PmiTopK""".stripMargin
  }

  // ------------------------------------------------------------------
  // Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
  // — the MOSS algorithm): slide a w-window over the doc's k-gram
  // hashes and keep each window's minimum; the selected set is a
  // position-robust fingerprint with a guaranteed density bound
  // (every match of length ≥ w+k-1 shares a fingerprint). Complements
  // the engine's global fingerprint (X13 rolling sha) and MinHash
  // (X2): winnowing is LOCAL — it finds partial overlap/plagiarism
  // spans, not whole-doc similarity. 60-bit hashes make window ties
  // (the one spot where tie rules differ) a non-event, so min-per-
  // window is deterministic cross-engine.
  // Scale shape: pure per-row array-expression work inside codegen —
  // ZERO shuffles beyond the input re-shard and presentation sort; the
  // emitted row is doc-level stats + an order-free XOR digest, never
  // the hash arrays.
  // ------------------------------------------------------------------
  val WinnowK = 3
  val WinnowW = 4

  def qWinnow(spark: SparkSession, dir: String): DataFrame = {
    val hs = transform(Hashing.wordShingles(toks, WinnowK), s => Hashing.h60(s))
    val windows = greatest(size($"hs") - lit(WinnowW - 1), lit(1))
    Tables.documentsSharded(spark, dir)
      .select($"doc_id", hs.as("hs"))
      .withColumn("sel",
        when(size($"hs") === 0, array().cast("array<long>"))
          .when(size($"hs") < WinnowW, array(array_min($"hs")))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size($"hs") - lit(WinnowW - 1)),
            j => array_min(slice($"hs", j, lit(WinnowW)))))))
      .select($"doc_id",
        size($"hs").cast("long").as("n_shingles"),
        size($"sel").cast("long").as("n_fp"),
        (size($"sel").cast("double") / windows.cast("double")).as("density"),
        aggregate($"sel", lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor"))
      .orderBy($"doc_id")
  }

  val sqlWinnow: String = {
    val t = Hashing.sqlTokens("text")
    val h = Hashing.sqlH60("s")
    s"""WITH d AS (SELECT doc_id,
       |    list_transform(${Hashing.sqlShingles("t", WinnowK)}, s -> $h) AS hs
       |  FROM (SELECT doc_id, $t AS t FROM documents)),
       |s AS (SELECT doc_id, len(hs)::BIGINT AS n_shingles,
       |  CASE WHEN len(hs) = 0 THEN []::BIGINT[]
       |       WHEN len(hs) < $WinnowW THEN [list_min(hs)]
       |       ELSE list_distinct(list_transform(
       |         range(1, len(hs) - ${WinnowW - 2}),
       |         j -> list_min(hs[j:j+${WinnowW - 1}]))) END AS sel
       |  FROM d)
       |SELECT doc_id, n_shingles, len(sel)::BIGINT AS n_fp,
       |  len(sel)::DOUBLE / greatest(n_shingles - ${WinnowW - 1}, 1)::DOUBLE
       |    AS density,
       |  CASE WHEN len(sel) = 0 THEN 0::BIGINT
       |       ELSE list_reduce(sel, (a, x) -> xor(a, x))::BIGINT END AS fp_xor
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Per-language tokenizer efficiency audit (X152): bytes-per-token by
  // language — the fairness audit that catches a tokenizer under-
  // serving a script/language BEFORE mixture weights commit (a
  // language whose bytes/token runs far above the corpus mean pays
  // more context budget per byte of content; cf. the byte-premium
  // findings around multilingual BPE vocabularies). One scan, one
  // map-side-combinable groupBy over |languages| rows; byte length is
  // the UTF-8 octet length (== chars on this ASCII synthetic corpus,
  // diverges on real multi-byte scripts), tokens are the shared
  // BPE-ish regex (so the count itself is value-gated by X12). Ratio
  // in exact integer ppm: (10⁶·bytes) div tokens, div-by-zero guarded
  // through NULLIF on both engines (DuckDB // 0 errors, Spark nulls).
  // int64 headroom: per-language bytes reach ~10¹³ at 100 TB, so the
  // 10⁶ ppm product runs in DECIMAL(38,0)/HUGEINT (the X151 stance).
  // ------------------------------------------------------------------
  def qTokenEfficiency(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select($"lang",
        octet_length($"text").cast("long").as("bytes"),
        size(regexp_extract_all($"text", lit(BpeIshPattern), lit(0)))
          .cast("long").as("toks"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"bytes").as("total_bytes"),
        sum($"toks").as("total_tokens"))
      .select($"lang", $"n_docs", $"total_bytes", $"total_tokens",
        expr("CAST(1000000 AS DECIMAL(38,0)) * CAST(total_bytes AS DECIMAL(38,0))" +
          " div CAST(nullif(total_tokens, 0) AS DECIMAL(38,0))")
          .cast("long").as("bytes_per_token_ppm"))
      .orderBy($"lang")

  val sqlTokenEfficiency: String =
    s"""WITH d AS (
       |  SELECT lang, octet_length(encode(text))::BIGINT AS bytes,
       |    len(regexp_extract_all(text, '$BpeIshPattern'))::BIGINT AS toks
       |  FROM documents),
       |a AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs,
       |    CAST(sum(bytes) AS BIGINT) AS total_bytes,
       |    CAST(sum(toks) AS BIGINT) AS total_tokens
       |  FROM d GROUP BY 1)
       |SELECT lang, n_docs, total_bytes, total_tokens,
       |  CAST((CAST(1000000 AS HUGEINT) * total_bytes)
       |    // NULLIF(total_tokens, 0) AS BIGINT) AS bytes_per_token_ppm
       |FROM a ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------
  // Word-frequency spectrum (X187 — the Zipf diagnostic qVocabCoverage
  // cannot see: the exact
  // frequency-of-frequencies table N_f = #types occurring f times,
  // the statistic behind Good-Turing smoothing (Gale & Sampson 1995)
  // and corpus-health checks — a healthy natural corpus has a long
  // hapax-heavy tail, boilerplate collapses it. The log2 bucket rides
  // along as length(bin(f)) = ⌊log2 f⌋ + 1 — an integer-exact log via
  // the binary-string length, identical in Spark and DuckDB, no libm.
  // Scale shape: term counts aggregate with map-side combine (the
  // shuffle carries |vocab| partials), and the spectrum is a second
  // ≤64-row map-side-combined aggregate; NO ranking window anywhere,
  // so unlike rank-based Zipf fits this needs no corpus-sized sort.
  // ------------------------------------------------------------------
  def qFreqSpectrum(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select(explode(toks).as("term"))
      .groupBy($"term").agg(count(lit(1)).cast("long").as("cnt"))
      .groupBy($"cnt".as("freq"))
      .agg(count(lit(1)).cast("long").as("n_terms"))
      .select($"freq", $"n_terms",
        ($"freq" * $"n_terms").as("occ_mass"),
        length(bin($"freq")).cast("long").as("log2_bucket"))
      .orderBy($"freq")

  val sqlFreqSpectrum: String = {
    val t = graft.functions.Hashing.sqlTokens("text")
    s"""WITH counts AS (
       |  SELECT term, count(*)::BIGINT AS cnt
       |  FROM (SELECT unnest($t) AS term FROM documents) GROUP BY 1)
       |SELECT cnt AS freq, count(*)::BIGINT AS n_terms,
       |  cnt * count(*) AS occ_mass,
       |  length(bin(cnt))::BIGINT AS log2_bucket
       |FROM counts GROUP BY cnt ORDER BY freq""".stripMargin
  }
}
