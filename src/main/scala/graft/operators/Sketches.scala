package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Sketch-based approximate aggregation — the operators that replace
 * their exact twins at 100 TB, where exact distinct counting
 * ([[Analytics.qQuantiles]]-style order statistics, COUNT(DISTINCT))
 * would shuffle the full key set. HyperLogLog++ distinct counts and
 * relative-error quantile sketches aggregate in fixed memory per
 * partition and merge associatively — the shuffle carries one sketch
 * per partition, independent of cardinality.
 *
 * Gate design: sketch *internals* are engine-specific (Spark HLL++ vs
 * DuckDB's HLL differ bit-wise by construction), so the oracle checks
 * the CONTRACT instead — exact values computed identically on both
 * engines, plus error-bound booleans that Spark evaluates against its
 * own sketches (deterministic for fixed input) and the oracle pins as
 * literal TRUE. A sketch drifting out of tolerance flips the boolean
 * and fails the row hash.
 */
object Sketches {
  import Relational.ColInterp

  /** Relative-error tolerance for HLL++ (default rsd = 0.05) and the
    * approx-percentile rank error (accuracy 10000 ⇒ 1e-4 rank error —
    * we allow the observed value to sit within ±2 % of the exact
    * order-statistic's rank neighborhood via a value-window check). */
  val HllRsd = 0.05
  val PctAccuracy = 10000

  def qSketchStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select($"event_type", $"user_id", $"value", $"event_id")
    // Exact references (order statistics, same formulation as the
    // oracle): p50/p99 per type + exact distinct users.
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val ranked = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
    def orderStat(q: Double) =
      min(when($"rn" >= ceil(lit(q) * $"n").cast("long"), $"value"))
    val exact = ranked.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("exact_users"),
        orderStat(0.5).as("p50_exact"),
        orderStat(0.99).as("p99_exact"))
    // Sketched versions: fixed-memory, merge-associative.
    val approx = ev.groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", HllRsd).as("hll_users"),
        percentile_approx($"value", array(lit(0.5), lit(0.99)), lit(PctAccuracy))
          .as("pq"))
      .select($"event_type", $"hll_users",
        element_at($"pq", 1).as("p50_approx"), element_at($"pq", 2).as("p99_approx"))
    exact.join(approx, "event_type")
      .select(
        $"event_type", $"n_events", $"exact_users", $"p50_exact", $"p99_exact",
        (abs($"hll_users" - $"exact_users").cast("double") /
          $"exact_users" <= 3 * HllRsd).as("hll_ok"),
        // quantile sketch: observed value within ±5 % of the exact
        // order statistic (values are positive in this table)
        (abs($"p50_approx" - $"p50_exact") <= lit(0.05) * $"p50_exact").as("p50_ok"),
        (abs($"p99_approx" - $"p99_exact") <= lit(0.05) * $"p99_exact").as("p99_ok"))
      .orderBy($"event_type")
  }

  val sqlSketchStats: String = {
    def os(q: Double) =
      s"min(value) FILTER (WHERE rn >= CAST(ceil($q * n) AS BIGINT))"
    s"""SELECT event_type, count(*) AS n_events,
       |  count(DISTINCT user_id) AS exact_users,
       |  ${os(0.5)} AS p50_exact, ${os(0.99)} AS p99_exact,
       |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p99_ok
       |FROM (SELECT event_type, user_id, value,
       |        row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // Corpus-pair overlap estimation: "should corpus A be deduped
  // against corpus B?" — the planning metric a multi-source training
  // pipeline computes BEFORE paying for a cross-corpus dedup join.
  // A corpus-level MinHash signature is the component-wise min of the
  // per-document signatures (one map-side-combined aggregate per
  // corpus — the shuffle carries NumHashes longs per corpus, not
  // content), and matching-component fraction estimates the
  // shingle-set Jaccard. The gate also computes the EXACT corpus-pair
  // Jaccard (one shuffle of slim (h, corpus) rows) so the estimate and
  // its ground truth sit in the same hash-compared row — at 100 TB
  // you keep the sketch column and drop the exact one.
  // Corpora here are the deterministic doc_id % 3 split (near-dup
  // families straddle it, so overlaps are non-trivial).
  // ------------------------------------------------------------------
  val OverlapCorpora = 3

  def qCorpusOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextKernelFunctions
    val K = Dedup.NumHashes
    val docs = graft.core.Scratch.persist(Tables.documentsSharded(spark, dir)
      .select(($"doc_id" % OverlapCorpora).as("corpus"),
        TextKernelFunctions.shingleHashes($"text").as("sh"),
        TextKernelFunctions.minhashSig($"text").as("sig")))
    docs.count() // one shingle/sig pass feeds both the sketch and the exact branch
    // corpus signature: component-wise min over docs (empty docs carry
    // -1 sentinels and must not poison the min)
    val minExprs = (0 until K).map { k =>
      min(when(element_at($"sig", k + 1) =!= -1L, element_at($"sig", k + 1))).as(s"m$k")
    }
    val sigs = docs.groupBy($"corpus").agg(minExprs.head, minExprs.tail: _*)
    val est = sigs.as("a").join(sigs.as("b"), col("a.corpus") < col("b.corpus"))
      .select(col("a.corpus").as("corpus_a"), col("b.corpus").as("corpus_b"),
        ((0 until K).map(k => when(col(s"a.m$k") === col(s"b.m$k"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / K).as("est_jaccard"))
    val flags = docs.select($"corpus", explode($"sh").as("h")).distinct()
      .groupBy($"h").agg(
        max(when($"corpus" === 0, 1L).otherwise(0L)).as("c0"),
        max(when($"corpus" === 1, 1L).otherwise(0L)).as("c1"),
        max(when($"corpus" === 2, 1L).otherwise(0L)).as("c2"))
    val counts = flags.agg(
      sum($"c0" * $"c1").as("i01"), sum(greatest($"c0", $"c1")).as("u01"),
      sum($"c0" * $"c2").as("i02"), sum(greatest($"c0", $"c2")).as("u02"),
      sum($"c1" * $"c2").as("i12"), sum(greatest($"c1", $"c2")).as("u12"))
    val exact = counts.selectExpr(
      "stack(3, 0L, 1L, i01, u01, 0L, 2L, i02, u02, 1L, 2L, i12, u12) as (corpus_a, corpus_b, inter, uni)")
      .select($"corpus_a", $"corpus_b",
        ($"inter".cast("double") / $"uni").as("exact_jaccard"))
    est.join(exact, Seq("corpus_a", "corpus_b"))
      .select($"corpus_a", $"corpus_b", $"est_jaccard", $"exact_jaccard")
      .orderBy($"corpus_a", $"corpus_b")
  }

  // ------------------------------------------------------------------
  // Bloom seen-filter (Bloom 1970; the crawler/ingest "have I seen
  // this content before?" membership test): build an m-bit filter
  // over the seen corpus's content hashes (k seeded bit positions per
  // key, words OR-combined), then probe an incoming batch — the
  // probabilistic twin of X56's exact incremental dedup: O(m) bits of
  // state instead of a persisted LSH index, at the price of false
  // positives. The gate computes maybe_seen (filter verdict),
  // exact_seen (ground truth via hash anti-join), and the
  // false_positive flag — at 100 TB you keep the filter column and
  // size m to the FP budget.
  //
  // Engine-exactness: unlike HLL (engine-specific internals), every
  // Bloom bit here is deterministic integer arithmetic — seeded
  // sha-derived positions, 32-bit words held in BIGINT so no shift
  // ever touches the sign bit — so the DuckDB oracle rebuilds the
  // SAME filter bit-for-bit. Scale shape: the build is one
  // map-side-combined bit_or over k·|corpus| slim (word, mask) rows
  // into ≤ m/32 words; the filter broadcasts; the probe is one scan
  // of the batch + a broadcast join — no corpus-sized shuffle
  // anywhere. Split convention matches X56 (doc_id % 10 = 7 is the
  // incoming batch).
  // ------------------------------------------------------------------
  val BloomBits = 65536L // m = 2^16
  val BloomWordBits = 32L // 32-bit words in BIGINT: shifts never overflow
  val BloomHashes = 3

  def qBloomFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing
    val keyed = Tables.documentsSharded(spark, dir)
      .select($"doc_id",
        sha2(concat_ws(" ", Hashing.tokens($"text")), 256).as("k"))
    val bits = keyed.select($"doc_id", $"k",
      explode(array((0 until BloomHashes).map(j =>
        Hashing.h60Seeded(j, $"k") % BloomBits): _*)).as("bit"))
      .select($"doc_id", $"k",
        expr(s"bit div $BloomWordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(bit % $BloomWordBits AS INT))")
          .as("mask"))
    val isIncoming = $"doc_id" % Dedup.IncomingMod === Dedup.IncomingRem
    val filterWords = bits.filter(!isIncoming)
      .groupBy($"word").agg(expr("bit_or(mask)").as("w_val"))
    val hits = bits.filter(isIncoming)
      .join(broadcast(filterWords), Seq("word"), "left")
      .groupBy($"doc_id", $"k")
      .agg(sum(when($"w_val".bitwiseAND($"mask") === $"mask", 1L).otherwise(0L))
        .as("nh"))
    val seen = keyed.filter(!isIncoming).select($"k").distinct()
      .withColumn("present", lit(true))
    hits.join(broadcast(seen), Seq("k"), "left")
      .select($"doc_id",
        ($"nh" === BloomHashes).as("maybe_seen"),
        coalesce($"present", lit(false)).as("exact_seen"))
      .withColumn("false_positive", $"maybe_seen" && !$"exact_seen")
      .orderBy($"doc_id")
  }

  val sqlBloomFilter: String = {
    import graft.functions.Hashing
    val t = Hashing.sqlTokens("text")
    val bitList = (0 until BloomHashes)
      .map(j => s"${Hashing.sqlH60(s"'$j' || '|' || k")} % $BloomBits")
      .mkString("[", ", ", "]")
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    sha256(coalesce(list_aggregate($t, 'string_agg', ' '), '')) AS k
       |  FROM documents),
       |bits AS (
       |  SELECT doc_id, k, bit // $BloomWordBits AS word,
       |    1::BIGINT << (bit % $BloomWordBits)::INTEGER AS mask
       |  FROM (SELECT doc_id, k, unnest($bitList) AS bit FROM keyed)),
       |fw AS (
       |  SELECT word, bit_or(mask) AS w_val FROM bits
       |  WHERE doc_id % ${Dedup.IncomingMod} <> ${Dedup.IncomingRem} GROUP BY 1),
       |hits AS (
       |  SELECT doc_id, k,
       |    sum(CASE WHEN (w_val & mask) = mask THEN 1 ELSE 0 END)::BIGINT AS nh
       |  FROM bits LEFT JOIN fw USING (word)
       |  WHERE doc_id % ${Dedup.IncomingMod} = ${Dedup.IncomingRem} GROUP BY 1, 2),
       |seen AS (
       |  SELECT DISTINCT k FROM keyed
       |  WHERE doc_id % ${Dedup.IncomingMod} <> ${Dedup.IncomingRem})
       |SELECT doc_id, nh = $BloomHashes AS maybe_seen,
       |  s.k IS NOT NULL AS exact_seen,
       |  (nh = $BloomHashes AND s.k IS NULL) AS false_positive
       |FROM hits h LEFT JOIN seen s ON h.k = s.k
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005): depth×width
  // counter grid, est(term) = min over rows of counter[d][h_d(term)] —
  // the fixed-memory frequency estimator that replaces an exact
  // per-term count when the vocabulary itself no longer fits (heavy
  // hitters under memory bounds, approximate tf for filtering). Like
  // the Bloom gate (and unlike HLL), every counter is deterministic
  // integer arithmetic, so the oracle rebuilds the identical sketch
  // and the gate hash-compares estimates EXACTLY — including the
  // one-sided overcount (est ≥ exact always; the overcount column
  // shows collision mass). Scale shape: term counts aggregate
  // map-side first (the sketch is built from |vocab| partials, never
  // raw tokens), the counter grid is ≤ depth·width rows and
  // broadcasts back for the min-readout, and the top-K cut is
  // TakeOrdered.
  // ------------------------------------------------------------------
  val CmsDepth = 4
  val CmsWidth = 256L
  val CmsTopK = 20

  def qCountMin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing
    val tf = Tables.documentsSharded(spark, dir)
      .select(explode(Hashing.tokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).cast("long").as("exact_cnt"))
    val rows = tf.select($"term", $"exact_cnt",
        explode(array((0 until CmsDepth).map(d => lit(d.toLong)): _*)).as("d"))
      .withColumn("idx", Hashing.h60(concat_ws("|", $"d", $"term")) % CmsWidth)
    val counters = rows.groupBy($"d", $"idx")
      .agg(sum($"exact_cnt").as("c"))
    rows.join(broadcast(counters), Seq("d", "idx"))
      .groupBy($"term", $"exact_cnt")
      .agg(min($"c").as("cms_est"))
      .withColumn("overcount", $"cms_est" - $"exact_cnt")
      .orderBy($"exact_cnt".desc, $"term")
      .limit(CmsTopK)
  }

  val sqlCountMin: String = {
    import graft.functions.Hashing
    val t = Hashing.sqlTokens("text")
    s"""WITH tf AS (
       |  SELECT term, count(*)::BIGINT AS exact_cnt
       |  FROM (SELECT unnest($t) AS term FROM documents) GROUP BY 1),
       |rows_ AS (
       |  SELECT term, exact_cnt, d,
       |    ${Hashing.sqlH60("d::VARCHAR || '|' || term")} % $CmsWidth AS idx
       |  FROM tf, (SELECT unnest(range(0, $CmsDepth)) AS d)),
       |counters AS (
       |  SELECT d, idx, sum(exact_cnt)::BIGINT AS c FROM rows_ GROUP BY 1, 2)
       |SELECT term, exact_cnt, min(c)::BIGINT AS cms_est,
       |  (min(c) - exact_cnt)::BIGINT AS overcount
       |FROM rows_ JOIN counters USING (d, idx)
       |GROUP BY term, exact_cnt
       |ORDER BY exact_cnt DESC, term LIMIT $CmsTopK""".stripMargin
  }

  val sqlCorpusOverlap: String = {
    import graft.functions.Hashing
    val K = Dedup.NumHashes
    val strs = s"list_distinct(${Hashing.sqlShingles(Hashing.sqlTokens("text"), Dedup.ShingleN)})"
    val hsh = s"list_transform($strs, sv -> ${Hashing.sqlH60("sv")})"
    val sig = Hashing.sqlMinhash(strs, K)
    val mins = (0 until K)
      .map(k => s"min(CASE WHEN sig[${k + 1}] <> -1 THEN sig[${k + 1}] END) AS m$k")
      .mkString(",\n       ")
    val matches = (0 until K)
      .map(k => s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id % $OverlapCorpora AS corpus, $hsh AS sh, $sig AS sig
       |           FROM documents),
       |m AS (SELECT corpus,
       |       $mins
       |      FROM d GROUP BY 1),
       |est AS (SELECT a.corpus AS corpus_a, b.corpus AS corpus_b,
       |          ($matches)::DOUBLE / $K AS est_jaccard
       |        FROM m a JOIN m b ON a.corpus < b.corpus),
       |f AS (SELECT h,
       |        max(CASE WHEN corpus = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
       |        max(CASE WHEN corpus = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
       |        max(CASE WHEN corpus = 2 THEN 1 ELSE 0 END)::BIGINT AS c2
       |      FROM (SELECT DISTINCT corpus, unnest(sh) AS h FROM d) GROUP BY h),
       |c AS (SELECT sum(c0*c1) AS i01, sum(greatest(c0,c1)) AS u01,
       |        sum(c0*c2) AS i02, sum(greatest(c0,c2)) AS u02,
       |        sum(c1*c2) AS i12, sum(greatest(c1,c2)) AS u12 FROM f),
       |x AS (SELECT 0::BIGINT AS corpus_a, 1::BIGINT AS corpus_b, i01 AS inter, u01 AS uni FROM c
       |      UNION ALL SELECT 0, 2, i02, u02 FROM c
       |      UNION ALL SELECT 1, 2, i12, u12 FROM c)
       |SELECT est.corpus_a, est.corpus_b, est_jaccard, inter::DOUBLE / uni AS exact_jaccard
       |FROM est JOIN x ON est.corpus_a = x.corpus_a AND est.corpus_b = x.corpus_b
       |ORDER BY 1, 2""".stripMargin
  }
}
