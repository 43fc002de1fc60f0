package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Hashing
import graft.sources.Tables

/**
 * Deterministic sampling for training-data pipelines. Random sampling
 * (`df.sample`) is not reproducible across runs/partitionings and not
 * auditable; content-hash sampling is both: membership depends only on
 * the row's key and a seed, so any engine — or a later re-run over a
 * re-partitioned 100 TB corpus — selects the identical sample. Both
 * operators are one scan with per-row hash work inside codegen; the
 * stratified variant adds one shuffle on the (tiny-cardinality)
 * stratum key.
 */
object Sampling {
  import Relational.ColInterp

  /** Sampling-universe hash: 60-bit sha-derived key of the doc id under
    * a named seed (shared with the DuckDB oracle). */
  private[operators] def sampleKey(seed: String, id: Column): Column =
    Hashing.h60(concat_ws("|", lit(seed), id.cast("string")))

  private[operators] def sqlSampleKey(seed: String, idSql: String): String =
    Hashing.sqlH60(s"'$seed' || '|' || CAST($idSql AS VARCHAR)")

  val Seed = "s42"
  val SampleMod = 10L // keep ids whose hash ≡ 0 (mod 10) ⇒ ~10% rate

  // ------------------------------------------------------------------
  // Bernoulli-by-hash sample: ~10% of documents, membership decided by
  // doc_id hash only. Filter runs at the scan (one pass, no shuffle);
  // the emitted hash key makes the decision auditable downstream.
  // ------------------------------------------------------------------
  def qHashSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars",
        sampleKey(Seed, $"doc_id").as("sample_key"))
      .filter($"sample_key" % SampleMod === 0)
      .orderBy($"doc_id")

  val sqlHashSample: String = {
    val k = sqlSampleKey(Seed, "doc_id")
    s"""SELECT doc_id, lang, source, n_chars, $k AS sample_key
       |FROM documents WHERE $k % $SampleMod = 0
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Stratified sample: a fixed per-stratum quota (here: per language),
  // rows chosen by hash order so the draw is deterministic and
  // unbiased within each stratum. One shuffle on the stratum key; at
  // scale the heavy strata are bounded by the quota before any further
  // processing (row_number + filter ⇒ Spark's WindowGroupLimit
  // pushes the top-k into the sort, never materializing full strata).
  // ------------------------------------------------------------------
  val QuotaPerStratum = 20

  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"lang").orderBy($"sample_key", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars", sampleKey(Seed, $"doc_id").as("sample_key"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= QuotaPerStratum)
      .orderBy($"lang", $"rk")
  }

  val sqlStratifiedSample: String = {
    val k = sqlSampleKey(Seed, "doc_id")
    s"""SELECT doc_id, lang, n_chars, sample_key, rk FROM (
       |  SELECT doc_id, lang, n_chars, $k AS sample_key,
       |    row_number() OVER (PARTITION BY lang ORDER BY $k, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $QuotaPerStratum
       |ORDER BY lang, rk""".stripMargin
  }

  // ------------------------------------------------------------------
  // Deterministic epoch shuffle: assign every document a shard and a
  // position within that shard, both derived solely from (seed, id).
  // This is the training-order pass: a new seed reshuffles the whole
  // corpus, yet any worker can recompute its own shard independently —
  // no global sort, no driver coordination. A single global row_number
  // would serialize 100 TB through one partition; sharding first keeps
  // the window per-shard, so each of the N shards sorts only ~1/N of
  // the keys (and Spark's WindowExec sees NumShards independent
  // partitions — embarrassingly parallel).
  // ------------------------------------------------------------------
  val EpochSeed = "epoch1"
  val NumShards = 8L

  def qEpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"shard").orderBy($"shuffle_key", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", sampleKey(EpochSeed, $"doc_id").as("shuffle_key"))
      .withColumn("shard", ($"shuffle_key" % NumShards).cast("long"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .orderBy($"shard", $"shard_pos")
  }

  val sqlEpochShuffle: String = {
    val k = sqlSampleKey(EpochSeed, "doc_id")
    s"""SELECT doc_id, shuffle_key, shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id)::BIGINT AS shard_pos
       |FROM (SELECT doc_id, $k AS shuffle_key, $k % $NumShards AS shard FROM documents)
       |ORDER BY shard, shard_pos""".stripMargin
  }

  // ------------------------------------------------------------------
  // Weighted fair-queueing interleave (Demers, Keshav & Shenker 1989,
  // applied to dataloading): the deterministic GLOBAL feed order that
  // serves source s proportionally to its weight — doc i of source s
  // is scheduled at virtual time vt = pos_s(i) · (L / w_s), L the
  // weight LCM, so a weight-4 source appears 4× as often as a
  // weight-1 source in any window of the schedule. This is the order
  // a multi-source training run streams batches in (the "mixture
  // without replacement" dataloader), and unlike a sampled mixture it
  // is exactly reproducible. Weights derive from the source index
  // (w = idx % 4 + 1) standing in for a tuned mixture table.
  //
  // Scale shape: per-source positions do NOT come from one window per
  // source (that serializes a corpus/|sources| partition through one
  // task — the exact ceiling the sequence-packing review flagged):
  // rank within (source, shard) + broadcast per-shard prefix offsets
  // — |sources|·NumShards parallel walkers, the X32/X38 two-phase
  // pattern. vt is exact integer arithmetic; the presentation sort is
  // a range exchange (parallel), not a single-partition window.
  // ------------------------------------------------------------------
  val WfqSeed = "wfq1"
  val WfqLcm = 12L // LCM of weights {1,2,3,4}

  def qWfqInterleave(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", $"source", sampleKey(WfqSeed, $"doc_id").as("k"))
      .withColumn("shard", ($"k" % NumShards).cast("long"))
      .withColumn("weight",
        (substring($"source", 4, 10).cast("long") % 4L + 1L).as("weight"))
    val wRn = Window.partitionBy($"source", $"shard").orderBy($"k", $"doc_id")
    val withRn = keyed.withColumn("rn", row_number().over(wRn).cast("long"))
    val offsets = keyed.groupBy($"source", $"shard")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum($"cnt").over(
        Window.partitionBy($"source").orderBy($"shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"source", $"shard", $"off")
    withRn.join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("pos", $"off" + $"rn")
      .withColumn("vt", $"pos" * (lit(WfqLcm) / $"weight").cast("long"))
      .select($"doc_id", $"source", $"weight", $"pos", $"vt")
      .orderBy($"vt", $"source", $"pos")
  }

  val sqlWfqInterleave: String = {
    val k = sqlSampleKey(WfqSeed, "doc_id")
    s"""WITH keyed AS (
       |  SELECT doc_id, source, $k AS k, $k % $NumShards AS shard,
       |    (CAST(substr(source, 4) AS BIGINT) % 4 + 1) AS weight
       |  FROM documents),
       |rn AS (
       |  SELECT doc_id, source, shard, weight,
       |    row_number() OVER (PARTITION BY source, shard ORDER BY k, doc_id)::BIGINT AS rn
       |  FROM keyed),
       |off AS (
       |  SELECT source, shard,
       |    coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY shard
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
       |  FROM (SELECT source, shard, count(*)::BIGINT AS cnt
       |        FROM keyed GROUP BY 1, 2))
       |SELECT doc_id, source, weight, off + rn AS pos,
       |  (off + rn) * ($WfqLcm // weight) AS vt
       |FROM rn JOIN off USING (source, shard)
       |ORDER BY vt, source, pos""".stripMargin
  }

  // ------------------------------------------------------------------
  // Leakage-safe train/valid/test split: the assignment unit is the
  // near-dup CLUSTER, not the document. Hashing doc_id alone would
  // scatter near-duplicate families across splits — the eval set then
  // contains paraphrases of training documents and measures
  // memorization, not generalization. Here every document inherits its
  // cluster representative ([[Clustering.dupLabels]], min doc_id of the
  // component; itself when unclustered) and the split is decided by
  // hashing that representative — so a whole near-dup family moves as
  // one unit, deterministically. Cost at scale: the label frame is
  // |clustered docs| (tiny), the join is a slim id⋈id equi-join, and
  // the hash decision is per-row codegen — no extra shuffle beyond the
  // label join.
  // ------------------------------------------------------------------
  val SplitSeed = "split1"

  def qLeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = Clustering.dupLabels(spark, dir)
      .select($"id".as("doc_id"), $"label")
    Tables.documents(spark, dir)
      .select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("split_unit"))
      .withColumn("split_key", sampleKey(SplitSeed, $"split_unit"))
      .select($"doc_id", $"split_unit",
        when($"split_key" % 10 === 8, "valid")
          .when($"split_key" % 10 === 9, "test")
          .otherwise("train").as("split"))
      .orderBy($"doc_id")
  }

  /** Oracle: same recursive-CTE connected components as
    * [[Clustering.sqlDupClusters]], then the same seeded-hash split
    * decision on the cluster representative. */
  val sqlLeakageSplit: String = {
    val pairsSql = Dedup.sqlMinhashLshPairs
    val k = sqlSampleKey(SplitSeed, "split_unit")
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
       |labels AS (SELECT id AS doc_id, min(r) AS label FROM reach GROUP BY 1),
       |u AS (SELECT d.doc_id, coalesce(l.label, d.doc_id) AS split_unit
       |      FROM documents d LEFT JOIN labels l USING (doc_id))
       |SELECT doc_id, split_unit,
       |  CASE $k % 10 WHEN 8 THEN 'valid' WHEN 9 THEN 'test' ELSE 'train' END AS split
       |FROM u ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Split audit: the release gate a dataset card quotes — per split
  // its doc count and assignment-unit (near-dup cluster) count, plus
  // the number of units that STRADDLE a split boundary. Straddle is
  // computed generically from the assignment (units observed with >1
  // distinct splits), NOT assumed zero, so the gate proves the
  // leakage-safety guarantee of [[qLeakageSplit]] in both engines
  // rather than restating its construction. Scale shape: both audits
  // are map-side-combined aggregates over the slim (doc, unit, split)
  // frame; the straddle scalar broadcasts back onto 3 rows.
  // ------------------------------------------------------------------
  def qSplitAudit(spark: SparkSession, dir: String): DataFrame = {
    val s = qLeakageSplit(spark, dir)
    val straddle = s
      .groupBy($"split_unit")
      .agg(countDistinct($"split").as("ns"))
      .agg(coalesce(sum(when($"ns" > 1, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("straddle_units"))
    s.groupBy($"split")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct($"split_unit").cast("long").as("n_units"))
      .crossJoin(broadcast(straddle))
      .orderBy($"split")
  }

  val sqlSplitAudit: String =
    s"""WITH s AS ($sqlLeakageSplit),
       |st AS (
       |  SELECT coalesce(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0)::BIGINT
       |    AS straddle_units
       |  FROM (SELECT split_unit, count(DISTINCT split) AS ns FROM s GROUP BY 1))
       |SELECT split, count(*)::BIGINT AS n_docs,
       |  count(DISTINCT split_unit)::BIGINT AS n_units, straddle_units
       |FROM s CROSS JOIN st
       |GROUP BY split, straddle_units ORDER BY split""".stripMargin

  // ------------------------------------------------------------------
  // Naive-split leakage audit: the counterfactual [[qSplitAudit]]
  // cannot see. Split the corpus per-DOCUMENT (the naive hash split
  // everyone writes first), then count the near-dup pairs
  // ([[Dedup.minhashLshPairsCore]], the same ≥ 0.5 Jaccard contract)
  // whose endpoints land in DIFFERENT splits — each is a test/valid
  // example whose near-copy sits in train, i.e. silent eval inflation
  // (the failure Lee et al. 2022 measure). The leakage-safe split
  // (cluster-unit assignment, [[qLeakageSplit]]) exists precisely to
  // zero this table's off-diagonal; this gate quantifies what it
  // prevents. Scale shape: the pair frame is the already-bounded LSH
  // candidate output; the split label is a per-row hash — two slim
  // id-keyed joins, one tiny (≤ 6 class) aggregate.
  // ------------------------------------------------------------------
  def qNaiveSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val naive = Tables.documents(spark, dir)
      .select($"doc_id", sampleKey(SplitSeed, $"doc_id").as("k"))
      .select($"doc_id",
        when($"k" % 10 === 8, "valid")
          .when($"k" % 10 === 9, "test")
          .otherwise("train").as("split"))
    Dedup.minhashLshPairsCore(spark, dir)
      .join(naive.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(naive.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .select(least($"sa", $"sb").as("split_a"), greatest($"sa", $"sb").as("split_b"))
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
      .withColumn("is_leak", $"split_a" =!= $"split_b")
      .orderBy($"split_a", $"split_b")
  }

  val sqlNaiveSplitLeakage: String = {
    val k = sqlSampleKey(SplitSeed, "doc_id")
    s"""WITH pairs AS (${Dedup.sqlMinhashLshPairs}),
       |naive AS (
       |  SELECT doc_id,
       |    CASE $k % 10 WHEN 8 THEN 'valid' WHEN 9 THEN 'test'
       |         ELSE 'train' END AS split
       |  FROM documents)
       |SELECT least(a.split, b.split) AS split_a,
       |  greatest(a.split, b.split) AS split_b,
       |  count(*)::BIGINT AS n_pairs,
       |  least(a.split, b.split) <> greatest(a.split, b.split) AS is_leak
       |FROM pairs p
       |  JOIN naive a ON p.doc_a = a.doc_id
       |  JOIN naive b ON p.doc_b = b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------------
  // Corpus mixture rebalancing ("data mixing"): draw the LARGEST
  // corpus that matches a target language mixture exactly, selecting
  // members deterministically by hash order. All quota math is integer
  // (weights are per-mille numerators), so both engines compute the
  // same quotas with no float rounding at the boundaries. Shape at
  // scale: one tiny per-stratum count, a scalar feasibility min
  // broadcast everywhere, and one per-stratum ranking window — the
  // corpus text itself never moves, only (doc_id, lang, hash).
  // ------------------------------------------------------------------
  /** Target mixture, integer per-mille weights summing to [[MixDenom]]. */
  val MixWeights: Seq[(String, Long)] =
    Seq("en" -> 300L, "de" -> 200L, "es" -> 200L, "fr" -> 150L, "zh" -> 150L)
  val MixDenom: Long = 1000L

  def qMixtureRebalance(spark: SparkSession, dir: String): DataFrame = {
    val weights = spark.createDataFrame(MixWeights).toDF("lang", "wt")
    val docs = Tables.documents(spark, dir)
      .filter($"lang".isin(MixWeights.map(_._1): _*))
      .select($"doc_id", $"lang", sampleKey(Seed, $"doc_id").as("sample_key"))
    // Feasible corpus size: N = min over strata of floor(cnt·D/w) —
    // the largest N with floor-quotas n_s = floor(N·w_s/D) ≤ cnt_s.
    // `div` is integral division on longs: exact, no float boundary.
    // The min is taken over the WEIGHT table (left join, absent stratum
    // counts as 0), not the observed strata: a weighted language with
    // zero documents must force n_max = 0 — otherwise it would silently
    // drop out of the min and the output mixture would no longer match
    // the declared target.
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    val feasible = weights.join(broadcast(counts), Seq("lang"), "left")
      .agg(min(expr(s"coalesce(cnt, 0) * $MixDenom div wt")).as("n_max"))
    val quotas = weights.crossJoin(broadcast(feasible))
      .select($"lang", expr(s"n_max * wt div $MixDenom").as("quota"))
    val w = Window.partitionBy($"lang").orderBy($"sample_key", $"doc_id")
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("lang"))
      .filter($"rk" <= $"quota")
      .select($"doc_id", $"lang", $"sample_key", $"rk", $"quota")
      .orderBy($"lang", $"rk")
  }

  // ------------------------------------------------------------------
  // Temperature mixing ("multinomial sampling with α = 0.5"): quotas
  // proportional to cnt_s^α instead of fixed weights — the standard
  // multi-source trick that upsamples small sources without letting
  // the largest one dominate (GPT-3 §2.2, XLM-R §3.1 style). All math
  // stays in exact integers: w_s = ⌊√cnt_s⌋ is exact in double for any
  // cnt < 2^52 (so floor(sqrt(·)) agrees bit-for-bit across engines),
  // and quotas are integer division against Σw. A quota may exceed a
  // tiny stratum's size — the draw then takes the whole stratum (no
  // replacement), which is the conventional cap. Same shape at scale
  // as [[qMixtureRebalance]]: tiny count aggregate, broadcast quotas,
  // one per-stratum ranking window; text never moves.
  // ------------------------------------------------------------------
  val TempTargetN = 200L

  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", sampleKey(Seed, $"doc_id").as("sample_key"))
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
      .withColumn("w", floor(sqrt($"cnt".cast("double"))).cast("long"))
    val tot = counts.agg(sum($"w").as("w_tot"))
    val quotas = counts.crossJoin(broadcast(tot))
      .select($"lang", $"cnt", $"w", expr(s"$TempTargetN * w div w_tot").as("quota"))
    val rw = Window.partitionBy($"lang").orderBy($"sample_key", $"doc_id")
    docs.withColumn("rk", row_number().over(rw).cast("long"))
      .join(broadcast(quotas), Seq("lang"))
      .filter($"rk" <= $"quota")
      .select($"doc_id", $"lang", $"cnt", $"w", $"quota", $"rk")
      .orderBy($"lang", $"rk")
  }

  val sqlTemperatureMix: String = {
    val k = sqlSampleKey(Seed, "doc_id")
    s"""WITH d AS (SELECT doc_id, lang, $k AS sample_key FROM documents),
       |c AS (SELECT lang, count(*) AS cnt, floor(sqrt(count(*)))::BIGINT AS w
       |      FROM d GROUP BY 1),
       |t AS (SELECT sum(w)::BIGINT AS w_tot FROM c),
       |q AS (SELECT lang, cnt, w, ($TempTargetN * w) // w_tot AS quota
       |      FROM c CROSS JOIN t),
       |r AS (SELECT doc_id, lang, sample_key,
       |        row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id)::BIGINT AS rk
       |      FROM d)
       |SELECT doc_id, lang, cnt, w, quota, rk
       |FROM r JOIN q USING (lang) WHERE rk <= quota
       |ORDER BY lang, rk""".stripMargin
  }

  val sqlMixtureRebalance: String = {
    val k = sqlSampleKey(Seed, "doc_id")
    val values = MixWeights.map { case (l, v) => s"('$l', $v)" }.mkString(", ")
    s"""WITH w(lang, wt) AS (VALUES $values),
       |d AS (SELECT doc_id, lang, $k AS sample_key FROM documents
       |      WHERE lang IN (${MixWeights.map(x => s"'${x._1}'").mkString(", ")})),
       |n AS (SELECT min(coalesce(cnt, 0) * $MixDenom // wt) AS n_max
       |      FROM w LEFT JOIN (SELECT lang, count(*) AS cnt FROM d GROUP BY 1) USING (lang)),
       |q AS (SELECT lang, (n_max * wt) // $MixDenom AS quota FROM w CROSS JOIN n),
       |r AS (SELECT doc_id, lang, sample_key,
       |        row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id)::BIGINT AS rk
       |      FROM d)
       |SELECT doc_id, lang, sample_key, rk, quota
       |FROM r JOIN q USING (lang) WHERE rk <= quota
       |ORDER BY lang, rk""".stripMargin
  }

  // ------------------------------------------------------------------
  // Importance-weighted data selection (DSIR-style — Xie et al. 2023,
  // "Data Selection for Language Models via Importance Resampling",
  // arXiv:2302.03169): score every raw document by how target-like its
  // hashed n-gram profile is. Features are hashed BIGRAMS bucketed to
  // DsirBuckets; the target sample (stand-in: doc_id ≡ DsirTargetRem
  // mod DsirTargetMod, the same held-out-slice device as
  // decontamination) and the raw rest each yield add-one-smoothed
  // bucket counts, and a document's score is the sum over its bigram
  // OCCURRENCES of the target/raw count ratio for that bucket.
  // Deviation from the paper, by the repo's cross-engine float law:
  // the per-bucket statistic is the RATIO (n_t+1)/(n_r+1) rounded to
  // DECIMAL(18,6) and decimal-summed, not its libm logarithm — log's
  // last-ulp varies by engine and a float sum is order-sensitive,
  // while decimal addition is exact in any order; ranking stays
  // target-monotone (a bucket's term grows with its target mass).
  // Scale shape: the bucket table is DsirBuckets rows — broadcast —
  // so scoring is one corpus scan + a slim (doc_id, decimal partial)
  // map-side-combined shuffle; `is_selected` applies a fixed
  // per-corpus-tuned threshold at no extra cost.
  // ------------------------------------------------------------------
  val DsirBuckets = 1024L
  val DsirTargetMod = 20L
  val DsirTargetRem = 7L
  val DsirThreshold = 8.0

  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val DEC18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val grams = Tables.documentsSharded(spark, dir)
      .select($"doc_id",
        explode_outer(Hashing.wordShingles(Hashing.tokens($"text"), 2)).as("g"))
      .select($"doc_id", pmod(Hashing.h60($"g"), lit(DsirBuckets)).as("b"))
    val isTarget = $"doc_id" % DsirTargetMod === DsirTargetRem
    val target = grams.filter(isTarget).where($"b".isNotNull)
      .groupBy($"b").agg(count(lit(1)).as("n_t"))
    val raw = grams.filter(!isTarget).where($"b".isNotNull)
      .groupBy($"b").agg(count(lit(1)).as("n_r"))
    val ratios = raw.join(target, Seq("b"), "left")
      .select($"b",
        ((coalesce($"n_t", lit(0L)) + 1).cast("double") /
          ($"n_r" + 1).cast("double")).cast(DEC18).as("ratio"))
    val score = coalesce(sum($"ratio"), lit(0).cast(DEC18)).cast("double")
    grams.filter(!isTarget)
      .join(broadcast(ratios), Seq("b"), "left")
      .groupBy($"doc_id").agg(
        count($"b").as("n_grams"),
        score.as("dsir_score"))
      .select($"doc_id", $"n_grams", $"dsir_score",
        ($"dsir_score" >= DsirThreshold).as("is_selected"))
      .orderBy($"doc_id")
  }

  val sqlDsirWeights: String = {
    val g = Hashing.sqlShingles(Hashing.sqlTokens("text"), 2)
    val b = s"${Hashing.sqlH60("u.g")} % $DsirBuckets"
    s"""WITH grams AS (
       |  SELECT doc_id, $b AS b
       |  FROM (SELECT doc_id, $g AS gs FROM documents) d, unnest(d.gs) AS u(g)),
       |t AS (SELECT b, count(*) AS n_t FROM grams
       |      WHERE doc_id % $DsirTargetMod = $DsirTargetRem GROUP BY 1),
       |r AS (SELECT b, count(*) AS n_r FROM grams
       |      WHERE doc_id % $DsirTargetMod != $DsirTargetRem GROUP BY 1),
       |ratios AS (SELECT r.b,
       |    CAST((coalesce(t.n_t, 0) + 1)::DOUBLE / (r.n_r + 1)::DOUBLE
       |         AS DECIMAL(18,6)) AS ratio
       |  FROM r LEFT JOIN t USING (b)),
       |docs AS (SELECT doc_id FROM documents WHERE doc_id % $DsirTargetMod != $DsirTargetRem),
       |scored AS (
       |  SELECT g.doc_id, count(g.b) AS n_grams,
       |    coalesce(sum(ratio), 0::DECIMAL(18,6))::DOUBLE AS dsir_score
       |  FROM grams g LEFT JOIN ratios USING (b)
       |  WHERE g.doc_id % $DsirTargetMod != $DsirTargetRem
       |  GROUP BY 1)
       |SELECT d.doc_id, coalesce(s.n_grams, 0)::BIGINT AS n_grams,
       |  coalesce(s.dsir_score, 0.0) AS dsir_score,
       |  coalesce(s.dsir_score, 0.0) >= $DsirThreshold AS is_selected
       |FROM docs d LEFT JOIN scored s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Token-budget selection: keep the highest-quality documents whose
  // tokens fit a global budget (total/BudgetDen) — the "we can only
  // train on X tokens" curation step. The quality score is the exact
  // integer type-token ratio (1000·distinct ÷ length, a lexical-
  // diversity heuristic), so every comparison is integer-exact.
  //
  // NO GLOBAL SORT: a corpus-wide order-by-quality would range-
  // partition 100 TB. Instead (the distributed-quantile pattern):
  // (1) one scan → per-doc (q, n_tokens); (2) a ≤1001-row quality
  // HISTOGRAM with a descending cumulative token sum — the only
  // unpartitioned window runs over the histogram, never the corpus;
  // (3) the boundary bucket + its remaining-token allowance broadcast
  // back; buckets above the boundary keep everything, the boundary
  // bucket fills its remainder in doc_id order via a per-bucket
  // cumulative window (one shuffle on q — worst-case skew is bounded
  // by the bucket resolution, the dial being the score granularity).
  // ------------------------------------------------------------------
  val BudgetDen = 5L

  def qBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documentsSharded(spark, dir)
      .select($"doc_id", Hashing.tokens($"text").as("t"))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        size(array_distinct($"t")).cast("long").as("n_uniq"))
      .withColumn("q", expr("(1000 * n_uniq) div greatest(n_tokens, 1)"))
    val budget = perDoc.agg(expr(s"sum(n_tokens) div $BudgetDen").as("bb"))
    // tiny histogram: the whole-frame window is over ≤1001 rows
    val wHist = Window.orderBy($"q".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `<=` matters: a budget landing EXACTLY on a bucket edge must
    // yield a rem-0 boundary (drop that bucket), not no boundary at
    // all — qb=null means "everything fits" and would select the
    // whole corpus
    val boundaryCond = $"cum" > $"bb" && ($"cum" - $"btok") <= $"bb"
    val marker = perDoc.groupBy($"q").agg(sum($"n_tokens").as("btok"))
      .crossJoin(broadcast(budget))
      .withColumn("cum", sum($"btok").over(wHist))
      .agg(
        max(when(boundaryCond, $"q")).as("qb"),
        max(when(boundaryCond, $"bb" - ($"cum" - $"btok"))).as("rem"))
    // boundary remainder fills in doc_id order; the cumulative window
    // is per-bucket, used only for the one boundary bucket
    val wBucket = Window.partitionBy($"q").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc.crossJoin(broadcast(marker))
      .withColumn("bcum", sum($"n_tokens").over(wBucket))
      .select($"doc_id", $"q", $"n_tokens",
        ($"q" > coalesce($"qb", lit(-1L)) ||
          ($"q" === $"qb" && $"bcum" <= $"rem")).cast("long").as("selected"))
      .orderBy($"doc_id")
  }

  val sqlBudgetSelect: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents),
       |d AS (SELECT doc_id, len(t)::BIGINT AS n_tokens,
       |        ((1000 * len(list_distinct(t))) // greatest(len(t), 1))::BIGINT AS q
       |      FROM tok),
       |b AS (SELECT (sum(n_tokens) // $BudgetDen)::BIGINT AS bb FROM d),
       |h AS (SELECT q, sum(n_tokens)::BIGINT AS btok FROM d GROUP BY q),
       |hc AS (SELECT q, btok,
       |         sum(btok) OVER (ORDER BY q DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
       |       FROM h),
       |m AS (SELECT
       |    max(CASE WHEN cum > bb AND cum - btok <= bb THEN q END) AS qb,
       |    max(CASE WHEN cum > bb AND cum - btok <= bb THEN bb - (cum - btok) END) AS rem
       |  FROM hc CROSS JOIN b),
       |dc AS (SELECT doc_id, q, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY q ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS bcum
       |       FROM d)
       |SELECT doc_id, q, n_tokens,
       |  (CASE WHEN q > coalesce(qb, -1) OR (q = qb AND bcum <= rem)
       |   THEN 1 ELSE 0 END)::BIGINT AS selected
       |FROM dc CROSS JOIN m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Per-source quality tiers (head / middle / tail): every source's
  // documents split into thirds by the same integer type-token-ratio
  // score as [[qBudgetSelect]] — the RedPajama/CCNet-style bucketing
  // that routes head-tier text to more epochs and tail-tier to
  // filtering. NO per-source sort of the corpus: tier boundaries come
  // from the per-source quality HISTOGRAM (≤1001 q values), exactly
  // the budget-select pattern — cumulative doc counts over the tiny
  // histogram pick bucket-granular boundaries (ties share a bucket,
  // so the cut is at bucket resolution, deterministically), and the
  // boundary frame broadcasts back onto the corpus for a per-row tier
  // verdict. Scale shape: one scan, one map-side-combined histogram,
  // windows only over histogram rows, one broadcast join.
  // ------------------------------------------------------------------
  def qQualityTiers(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documentsSharded(spark, dir)
      .select($"source", $"doc_id", Hashing.tokens($"text").as("t"))
      .select($"source", $"doc_id",
        size($"t").cast("long").as("n_tokens"),
        expr("(1000 * size(array_distinct(t))) div greatest(size(t), 1)")
          .cast("long").as("q"))
    // ≤1001 rows per source: cum counts over the histogram, never docs
    val wHist = Window.partitionBy($"source").orderBy($"q".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"source")
    val tiers = perDoc.groupBy($"source", $"q")
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum($"n").over(wHist))
      .withColumn("tot", sum($"n").over(wTot))
      .withColumn("tier",
        when($"cum" <= expr("(tot + 2) div 3"), 1L)
          .when($"cum" <= expr("(2 * tot + 2) div 3"), 2L)
          .otherwise(3L))
      .select($"source", $"q", $"tier")
    perDoc.join(broadcast(tiers), Seq("source", "q"))
      .groupBy($"source", $"tier")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"n_tokens").cast("long").as("token_mass"),
        min($"q").cast("long").as("min_q"),
        max($"q").cast("long").as("max_q"))
      .orderBy($"source", $"tier")
  }

  val sqlQualityTiers: String = {
    val t = Hashing.sqlTokens("text")
    s"""WITH d AS (
       |  SELECT source, doc_id, len(t)::BIGINT AS n_tokens,
       |    ((1000 * len(list_distinct(t))) // greatest(len(t), 1))::BIGINT AS q
       |  FROM (SELECT source, doc_id, $t AS t FROM documents)),
       |h AS (SELECT source, q, count(*)::BIGINT AS n FROM d GROUP BY 1, 2),
       |hc AS (
       |  SELECT source, q,
       |    sum(n) OVER (PARTITION BY source ORDER BY q DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
       |    sum(n) OVER (PARTITION BY source)::BIGINT AS tot
       |  FROM h),
       |tiers AS (
       |  SELECT source, q,
       |    CASE WHEN cum <= (tot + 2) // 3 THEN 1
       |         WHEN cum <= (2 * tot + 2) // 3 THEN 2
       |         ELSE 3 END::BIGINT AS tier
       |  FROM hc)
       |SELECT source, tier, count(*)::BIGINT AS n_docs,
       |  sum(n_tokens)::BIGINT AS token_mass,
       |  min(q)::BIGINT AS min_q, max(q)::BIGINT AS max_q
       |FROM d JOIN tiers USING (source, q)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------------
  // Per-source document cap ("domain capping", RefinedWeb / Common
  // Crawl curation: no single domain may contribute more than N
  // documents, so one mega-site cannot dominate the mixture). Within
  // each source, documents are ranked by the seeded hash of their id
  // (deterministic, selection-bias-free — NOT by doc_id, which would
  // favor old crawls) and the first CapPerSource survive. Scale
  // shape: one shuffle on source for the rank window; per-source
  // partitions are as big as the biggest domain — exactly the skew
  // AQE's split handles — and only (doc_id, source, hash) rows move,
  // never text.
  // ------------------------------------------------------------------
  val CapSeed = "cap1"
  val CapPerSource = 80L

  def qDomainCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"source").orderBy($"k", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", sampleKey(CapSeed, $"doc_id").as("k"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select($"doc_id", $"source", $"rk",
        ($"rk" <= CapPerSource).as("is_kept"))
      .orderBy($"doc_id")
  }

  val sqlDomainCap: String = {
    val k = sqlSampleKey(CapSeed, "doc_id")
    s"""SELECT doc_id, source, rk, rk <= $CapPerSource AS is_kept FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY $k, doc_id)::BIGINT AS rk
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Weighted priority sampling, k per source (Duffield, Lund & Thorup,
  // JACM 2007: "Priority sampling for estimation of arbitrary subset
  // sums"). Each document draws priority w/u — weight w = n_chars,
  // u a seeded-hash uniform — and the k highest priorities per source
  // survive, with threshold τ = the (k+1)-th priority. The kept rows
  // carry ŵ = max(w, τ), the estimator making ANY subset-sum of the
  // sample unbiased for the population — what plain top-k or uniform
  // sampling cannot give, and the property that lets a 100 TB corpus
  // be profiled from a bounded per-source sketch without a second
  // pass. Exactness: u = (h mod 2²⁰ + 1)/2²⁰, so the priority is one
  // IEEE divide of two exactly-representable integers — reproducible
  // bit-for-bit in both engines; no transcendental (the exp-jump A-ES
  // formulation would need `ln`, whose libm rounding differs across
  // engines). Scale shape: one slim shuffle on source for the rank
  // window — only (doc_id, source, n_chars, pri) rows move, never
  // text; per-source partitions skew with the biggest domain, exactly
  // what AQE skew-split handles.
  // ------------------------------------------------------------------
  val PriSeed = "pri1"
  val PriK = 16L
  val PriM = 1048576L // 2^20 — the uniform's exact-in-double grid

  private def r6(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(28, 12))
      .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double")
  private val rSql =
    (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"

  /** (doc_id, source, n_chars, pri) for raw document rows — the
    * priority draw every consumer (batch face, streaming reservoir)
    * shares. */
  def priorityFrame(docs: DataFrame): DataFrame =
    docs.select($"doc_id", $"source", $"n_chars",
      (($"n_chars" * lit(PriM)).cast("double") /
        (sampleKey(PriSeed, $"doc_id") % PriM + 1L).cast("double")).as("pri"))

  /** Per-source top-`keep` rows by priority — the MERGEABLE reservoir:
    * the top-m of a union of partial top-m's IS the global top-m, so a
    * streaming ingest folds each micro-batch into a (k+1)-deep store
    * and never revisits earlier data (pinned stream ≡ batch in
    * ReplayEquivalenceSpec). k+1 deep, not k: the face needs the
    * (k+1)-th priority as the estimator threshold τ. */
  def priorityReservoir(frame: DataFrame, keep: Long): DataFrame = {
    val w = Window.partitionBy($"source").orderBy($"pri".desc, $"doc_id")
    frame.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= keep).drop("rk")
  }

  /** Gate face over a priority frame (full corpus or merged reservoir —
    * identical by mergeability). */
  def priorityFace(frame: DataFrame): DataFrame = {
    val wRank = Window.partitionBy($"source").orderBy($"pri".desc, $"doc_id")
    val wSrc = Window.partitionBy($"source")
    frame
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("tau", coalesce(
        max(when($"rk" === PriK + 1L, $"pri")).over(wSrc), lit(0.0)))
      .filter($"rk" <= PriK)
      .select($"doc_id", $"source", $"n_chars", $"rk",
        r6($"pri").as("priority"), r6($"tau").as("tau"),
        r6(greatest($"n_chars".cast("double"), $"tau")).as("w_est"))
      .orderBy($"doc_id")
  }

  def qPrioritySample(spark: SparkSession, dir: String): DataFrame =
    priorityFace(priorityFrame(Tables.documents(spark, dir)))

  val sqlPrioritySample: String = {
    val h = sqlSampleKey(PriSeed, "doc_id")
    s"""WITH d AS (SELECT doc_id, source, n_chars,
       |    CAST(n_chars * $PriM AS DOUBLE) / CAST(($h % $PriM) + 1 AS DOUBLE) AS pri
       |  FROM documents),
       |r AS (SELECT doc_id, source, n_chars, pri,
       |    row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id)::BIGINT AS rk
       |  FROM d),
       |t AS (SELECT doc_id, source, n_chars, pri, rk,
       |    coalesce(max(CASE WHEN rk = ${PriK + 1} THEN pri END)
       |      OVER (PARTITION BY source), 0.0::DOUBLE) AS tau
       |  FROM r)
       |SELECT doc_id, source, n_chars, rk,
       |  ${rSql("pri")} AS priority, ${rSql("tau")} AS tau,
       |  ${rSql("greatest(CAST(n_chars AS DOUBLE), tau)")} AS w_est
       |FROM t WHERE rk <= $PriK ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // UniMax budget allocation (Chung et al., ICLR 2023: "UniMax: Fairer
  // and More Effective Language Sampling for Large-Scale Multilingual
  // Pretraining"): split a total training-token budget B across
  // sources so no source repeats more than E epochs, and what the
  // capped sources cannot absorb spills UNIFORMLY to the rest — the
  // closed-form waterfill: alloc_i = min(cap_i, τ) with cap_i = E·sz_i
  // and water level τ chosen so Σ alloc ≈ B. τ comes from the sorted
  // prefix scan: the capped set is a prefix of sources ordered by cap
  // (standard waterfill argument), m = |prefix| where
  // cap_j·(n−j+1) + cum_{j−1} ≤ B, and τ = (B − cum_m) div (n − m).
  // All arithmetic is integer (div, not float division — floor(a/b)
  // on doubles can be off by one ulp cross-engine); the only double is
  // the r6'd epochs report. Scale shape: everything past the one
  // per-source aggregate runs on the |sources|-row frame — the
  // single-partition sort window there orders sources, not corpus
  // rows, and the scalar terms ride broadcast single-row aggregates
  // (the repo's crossJoin-broadcast convention).
  // ------------------------------------------------------------------
  val UniMaxEpochs = 4L
  val UniMaxBudgetEpochs = 2L // B = 2 × total corpus mass

  def qUnimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(sum($"n_chars").cast("long").as("sz"))
      .withColumn("cap", ($"sz" * UniMaxEpochs).cast("long"))
    val scalars = src.agg(
      (sum($"sz") * UniMaxBudgetEpochs).cast("long").as("b"),
      count(lit(1)).cast("long").as("n"),
      max($"cap").cast("long").as("max_cap"))
    val wOrd = Window.orderBy($"cap", $"source")
    val ranked = src.crossJoin(broadcast(scalars))
      .withColumn("j", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum($"cap")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("is_capped",
        $"cap" <= expr("(b - (cum - cap)) div (n - j + 1)"))
    val boundary = ranked.agg(
      sum(when($"is_capped", 1L).otherwise(0L)).cast("long").as("m"),
      coalesce(max(when($"is_capped", $"cum")), lit(0L)).cast("long").as("cum_m"))
    ranked.crossJoin(broadcast(boundary))
      .withColumn("tau", when($"m" === $"n", $"max_cap")
        .otherwise(expr("(b - cum_m) div (n - m)")).cast("long"))
      .withColumn("alloc", least($"cap", $"tau").cast("long"))
      .withColumn("epochs", r6($"alloc".cast("double") / $"sz".cast("double")))
      .select($"source", $"sz", $"cap", $"tau", $"alloc", $"epochs")
      .orderBy($"source")
  }

  val sqlUnimaxAlloc: String =
    s"""WITH src AS (SELECT source, sum(n_chars)::BIGINT AS sz,
       |    sum(n_chars)::BIGINT * $UniMaxEpochs AS cap
       |  FROM documents GROUP BY source),
       |s1 AS (SELECT sum(sz)::BIGINT * $UniMaxBudgetEpochs AS b,
       |    count(*)::BIGINT AS n, max(cap)::BIGINT AS max_cap FROM src),
       |r AS (SELECT source, sz, cap, b, n, max_cap,
       |    row_number() OVER (ORDER BY cap, source)::BIGINT AS j,
       |    sum(cap) OVER (ORDER BY cap, source
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
       |  FROM src CROSS JOIN s1),
       |r2 AS (SELECT source, sz, cap, b, n, max_cap, j, cum,
       |    cap <= ((b - (cum - cap)) // (n - j + 1)) AS is_capped FROM r),
       |s2 AS (SELECT coalesce(sum(CASE WHEN is_capped THEN 1 ELSE 0 END), 0)::BIGINT AS m,
       |    coalesce(max(CASE WHEN is_capped THEN cum END), 0)::BIGINT AS cum_m FROM r2),
       |f AS (SELECT source, sz, cap,
       |    (CASE WHEN m = n THEN max_cap
       |          ELSE (b - cum_m) // (n - m) END)::BIGINT AS tau
       |  FROM r2 CROSS JOIN s2)
       |SELECT source, sz, cap, tau, least(cap, tau)::BIGINT AS alloc,
       |  ${rSql("CAST(least(cap, tau) AS DOUBLE) / CAST(sz AS DOUBLE)")} AS epochs
       |FROM f ORDER BY source""".stripMargin
}
