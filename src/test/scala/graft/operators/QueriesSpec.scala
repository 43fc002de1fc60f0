package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.SparkSpec.Sf0001

/** Smoke + semantic assertions for the declared query surface at
  * sf0.001 (the DuckDB hash-compare at sf0.01 is the authoritative
  * gate; these tests pin the properties the hash can't see). */
class QueriesSpec extends SparkSpec {

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q_topn_per_key: at most 3 rows per key, ranks within 1..3") {
    import spark.implicits._
    val df = Relational.qTopNPerKey(spark, Sf0001).cache()
    try {
      assert(df.filter($"rk" < 1 || $"rk" > 3).isEmpty)
      assert(df.groupBy($"o_custkey").count().filter($"count" > 3).isEmpty)
    } finally df.unpersist()
  }

  test("q_sort_limit: exactly 10 rows in descending price order") {
    val prices = Relational.qSortLimit(spark, Sf0001)
      .collect().map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices.size == 10)
    assert(prices == prices.sorted.reverse)
  }

  test("MinHash LSH recall: equals exact n-gram Jaccard pairs at >= 0.5 on the prefix") {
    import spark.implicits._
    val lsh = Dedup.qMinhashLshPairs(spark, Sf0001)
      .filter($"doc_a" < 500 && $"doc_b" < 500)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.qNgramJaccard(spark, Sf0001)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // planted near-dups are ~0.98 similar: full recall
  }

  test("ANN LSH and IVF results are bounded by the brute-force top-1") {
    import spark.implicits._
    // every ANN cosine must be <= the brute-force top-1 for that query
    val brute = Similarity.qKnnBruteForce(spark, Sf0001)
      .filter($"rank" === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    Seq(Similarity.qAnnLsh(spark, Sf0001), Similarity.qAnnIvf(spark, Sf0001)).foreach { df =>
      val ann = df.collect()
      assert(ann.nonEmpty)
      ann.foreach { r =>
        val q = r.getAs[Long]("query_id")
        assert(r.getAs[Double]("cosine") <= brute(q) + 1e-12)
      }
    }
  }

  test("BPE-ish token count is at least the whitespace token count") {
    import spark.implicits._
    val df = TextOps.qTokenCount(spark, Sf0001)
    assert(df.filter($"bpe_tokens" < $"ws_tokens").isEmpty)
    assert(df.filter($"chars_per_token" <= 0).isEmpty)
  }

  test("token efficiency: per-lang partition of the corpus, every token costs at least one byte") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = TextOps.qTokenEfficiency(spark, Sf0001).collect()
    val langs = rows.map(_.getString(0))
    assert(langs.distinct.length == langs.length && langs.nonEmpty)
    assert(rows.map(_.getLong(1)).sum ==
      graft.sources.Tables.documents(spark, Sf0001).count(),
      "language groups must partition the corpus")
    rows.foreach { r =>
      val (bytes, toks, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(toks <= bytes, "a BPE-ish token spans at least one byte")
      assert(ppm >= 1000000L, "so bytes/token is at least 1.0")
      assert(ppm == 1000000L * bytes / toks, "ppm is the exact truncated ratio")
    }
  }

  test("word count total equals token count of the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val total = TextOps.qWordCount(spark, Sf0001)
      .agg(sum($"cnt")).head().getLong(0)
    val expected = graft.sources.Tables.documents(spark, Sf0001)
      .select(size(graft.functions.Hashing.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(total == expected)
  }

  test("BPE trainer: K ranked merges, argmax-first, later merges consume earlier outputs") {
    import spark.implicits._
    val rows = TextOps.qBpeTrain(spark, Sf0001)
      .select($"rank", $"lhs", $"rhs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length == TextOps.BpeTrainRounds)
    assert(rows.map(_._1).toSeq == (1L to TextOps.BpeTrainRounds.toLong))
    // the corpus's dominant adjacent pair on this testdata family is
    // (e, r) — the same first merge the frozen qBpeEncode table pins
    assert((rows.head._2, rows.head._3) == ("e", "r"))
    // compositionality: at least one later merge consumes an earlier
    // merge's output symbol (the defining property of the BPE loop vs
    // K independent pair counts)
    val produced = rows.map { case (_, l, r) => l + r }.toSet
    assert(rows.tail.exists { case (_, l, r) => produced(l) || produced(r) })
  }

  test("exact dedup: canonical ids are minimal doc_ids and copies sum to corpus size") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Dedup.qExactDedup(spark, Sf0001).cache()
    try {
      val nDocs = graft.sources.Tables.documents(spark, Sf0001).count()
      assert(df.agg(sum($"n_copies")).head().getLong(0) == nDocs)
      assert(df.count() <= nDocs)
    } finally df.unpersist()
  }

  test("pseudonymization: token join returns exactly the raw join's rows, tokens injective on the key domain") {
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, Sf0001)
      .select($"o_orderkey", $"o_custkey",
        Analytics.pseudonym($"o_custkey").as("tok"))
    val c = graft.sources.Tables.customer(spark, Sf0001)
      .select($"c_custkey", Analytics.pseudonym($"c_custkey").as("ctok"),
        $"c_mktsegment")
    val viaTok = o.join(c, $"tok" === $"ctok")
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaRaw = o.join(c, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaTok == viaRaw, "referential integrity must survive tokenization")
    // injective on the union of both key domains: distinct tokens ==
    // distinct keys, and re-tokenizing is stable (deterministic)
    val keys = c.select($"c_custkey".as("k"))
      .unionByName(o.select($"o_custkey".as("k"))).distinct()
    val n = keys.count()
    assert(keys.select(Analytics.pseudonym($"k")).distinct().count() == n)
    assert(keys.select(Analytics.pseudonym($"k")).distinct()
      .intersect(keys.select(Analytics.pseudonym($"k")).distinct()).count() == n)
  }
}
