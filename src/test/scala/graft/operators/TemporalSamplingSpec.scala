package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf0001
import graft.sources.Tables

/** Semantics for the round-4 operators: temporal joins (as-of, bucketed
  * range), near-dup clustering, deterministic sampling, and TF-IDF.
  * Each join operator is pinned against an independent naive
  * formulation computed in-Spark (the DuckDB gate pins cross-engine
  * values; these pin the *algorithmic* equivalence of the scale-shaped
  * encoding to the obvious-but-quadratic one). */
class TemporalSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join equals the naive latest-at-or-before formulation") {
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), unix_millis($"ts").as("c_ts"), $"value".as("cv"))
      .groupBy($"cu", $"c_ts").agg(max($"cv").as("c_val"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value")
    // Quadratic reference: all past clicks per purchase, keep the latest.
    val w = Window.partitionBy($"event_id").orderBy($"c_ts".desc_nulls_last)
    val naive = purchases
      .join(clicks, $"cu" === $"user_id" && $"c_ts" <= $"ts_ms", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"ts_ms", $"event_id", $"value",
        $"c_ts".as("click_ts_ms"), $"c_val".as("click_value"))
    val got = Temporal.qAsofJoin(spark, Sf0001)
    assert(got.count() == purchases.count()) // left semantics: every probe kept
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("as-of join plan is join-free: one pass over the tagged union") {
    val plan = Temporal.qAsofJoin(spark, Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "union-trick as-of must not plan a join")
  }

  test("range join equals the naive inequality join, including zero-match probes") {
    val ev = Tables.events(spark, Sf0001)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value").as("p")
    val e = ev.filter($"event_type" === "error")
      .select($"user_id".as("eu"), unix_millis($"ts").as("e_ts"), $"value".as("e_val")).as("e")
    val naive = p.join(e,
        $"eu" === $"user_id" &&
        $"e_ts" >= $"ts_ms" - Temporal.WindowMs && $"e_ts" < $"ts_ms", "left")
      .groupBy($"user_id", $"ts_ms", $"event_id", $"value")
      .agg(count($"e_ts").as("n_errors"),
        coalesce(sum($"e_val".cast("decimal(18,6)")).cast("double"), lit(0.0)).as("err_value"))
    val got = Temporal.qRangeJoin(spark, Sf0001)
    assert(got.count() == p.count()) // every purchase kept, matched or not
    assert(got.filter($"n_errors" === 0 && $"err_value" =!= 0.0).isEmpty)
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("range join plan is an equi-join on (key, bucket), never a nested loop") {
    val plan = Temporal.qRangeJoin(spark, Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketed range join must plan as a hash-partitioned equi-join")
  }

  test("connected components: chains merge transitively, separate components stay apart") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val labels = Clustering.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connected components: un-converged propagation fails loudly, not silently") {
    // a 12-node chain has diameter 11 — two rounds cannot converge, and
    // returning the half-propagated labels would silently split the
    // component for every downstream consumer
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Clustering.connectedComponents(chain, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connected components: pointer jumping converges a diameter-11 chain in O(log) rounds") {
    // plain min-label needs ~11 rounds on this chain; with pointer
    // jumping (label := label(label)) depth halves per round, so 5
    // rounds (4 to reach the min + 1 to observe the fixed point) are
    // enough — the chain-shaped-graph guarantee X118 relies on
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Clustering.connectedComponents(chain, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 12 && labels.forall(_._2 == 0L))
  }

  test("mixture rebalance: a weighted language with zero documents forces an empty draw") {
    // the target mixture is infeasible when a weighted stratum is
    // absent — the feasibility min must see the 0, not drop the stratum
    val tmp = java.nio.file.Files.createTempDirectory("mix_zero").toString
    try {
      Tables.documents(spark, Sf0001)
        .filter($"lang" =!= Sampling.MixWeights.head._1)
        .write.parquet(s"$tmp/documents.parquet")
      assert(Sampling.qMixtureRebalance(spark, tmp).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("dup clusters: every LSH pair is co-clustered and cluster_id is the member min") {
    val clusters = Clustering.qDupClusters(spark, Sf0001).cache()
    try {
      val byDoc = clusters.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val pairs = Dedup.qMinhashLshPairs(spark, Sf0001)
        .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty)
      pairs.foreach { case (a, b) =>
        assert(byDoc(a)._1 == byDoc(b)._1, s"pair ($a,$b) split across clusters")
      }
      // label = min member id; size = member count
      byDoc.groupBy(_._2._1).foreach { case (cid, members) =>
        assert(members.keys.min == cid)
        assert(members.values.map(_._2).toSet == Set(members.size.toLong))
      }
    } finally clusters.unpersist()
  }

  test("hash sample: deterministic, ~rate-bounded, and membership is hash-defined") {
    val s1 = Sampling.qHashSample(spark, Sf0001).cache()
    try {
      assert(s1.filter($"sample_key" % Sampling.SampleMod =!= 0).isEmpty)
      val n = s1.count()
      val total = Tables.documents(spark, Sf0001).count()
      assert(n > 0 && n < total / 5) // ~10% draw, loose bound
      val s2 = Sampling.qHashSample(spark, Sf0001)
      assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
    } finally s1.unpersist()
  }

  test("stratified sample: per-stratum quota respected, ranks contiguous from 1") {
    val s = Sampling.qStratifiedSample(spark, Sf0001).cache()
    try {
      val perLang = s.groupBy($"lang").agg(count(lit(1)).as("n"), max($"rk").as("mx"))
        .collect()
      assert(perLang.nonEmpty)
      perLang.foreach { r =>
        assert(r.getAs[Long]("n") <= Sampling.QuotaPerStratum)
        assert(r.getAs[Long]("mx") == r.getAs[Long]("n")) // ranks 1..n, no gaps
      }
    } finally s.unpersist()
  }

  test("stratified sample plan bounds strata with WindowGroupLimit (top-k, not full sort)") {
    val plan = Sampling.qStratifiedSample(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("leakage split: every near-dup cluster lands in exactly one split, all docs covered") {
    val s = Sampling.qLeakageSplit(spark, Sf0001).cache()
    try {
      assert(s.count() == Tables.documents(spark, Sf0001).count()) // total cover
      assert(s.select($"doc_id").distinct().count() == s.count())  // one verdict per doc
      // The leakage guarantee: a split unit (near-dup family) never straddles splits.
      assert(s.groupBy($"split_unit").agg(countDistinct($"split").as("k"))
        .filter($"k" > 1).isEmpty)
      // Clustered families exist at this SF and move as one unit.
      assert(s.filter($"split_unit" =!= $"doc_id").count() > 0)
      assert(s.select($"split").distinct().count() == 3) // all three splits drawn
    } finally s.unpersist()
  }

  test("tfidf: at most k terms per doc and score is exactly tf * n_docs / df") {
    val n = Tables.documents(spark, Sf0001).count()
    val t = TextOps.qTfidf(spark, Sf0001).cache()
    try {
      assert(t.filter($"rk" < 1 || $"rk" > TextOps.TfidfTopK).isEmpty)
      assert(t.groupBy($"doc_id").count().filter($"count" > TextOps.TfidfTopK).isEmpty)
      assert(t.filter($"score" =!= ($"tf" * n).cast("double") / $"df").isEmpty)
      assert(t.filter($"df" > n || $"df" < 1).isEmpty)
    } finally t.unpersist()
  }
}
