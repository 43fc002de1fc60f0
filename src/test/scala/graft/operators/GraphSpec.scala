package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.{Sf0001, Sf001}

/** Semantics for the round-9 warehouse/graph additions: PageRank
  * (X129), gap-fill (X130), SCD2 (X131), edit-distance verify (X132),
  * k-anonymity (X133). The DuckDB gate pins cross-engine values; these
  * pin the algorithmic properties the hash can't see — rank ordering
  * on known graph shapes, fill/interval invariants, privacy
  * post-conditions. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long, Long)],
      rounds: Int = Graph.Rounds): Map[Long, Long] = {
    // fresh frame per call — the factory contract pagerankRanks
    // documents (reused attribute ids through the ranks lineage trip
    // Catalyst's union constraint rewrite)
    def mk() = {
      val e = edges.toDF("src", "dst", "w")
      e.unionByName(e.select($"dst".as("src"), $"src".as("dst"), $"w"))
    }
    Graph.pagerankRanks(() => mk(), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pagerank: star center outranks every leaf, and leaves tie exactly") {
    val star = (1L to 6L).map(l => (0L, l, 1L))
    val r = ranksOf(star)
    assert((1L to 6L).forall(l => r(0L) > r(l)))
    assert((1L to 6L).map(r).distinct.size == 1, "symmetric leaves must tie")
  }

  test("pagerank: ring symmetry gives every node the identical rank") {
    val n = 8L
    val ring = (0L until n).map(i => (i, (i + 1) % n, 1L))
    val r = ranksOf(ring)
    assert(r.values.toSeq.distinct.size == 1)
  }

  test("pagerank: rank mass is conserved up to integer-truncation loss") {
    val star = (1L to 6L).map(l => (0L, l, 1L))
    val r = ranksOf(star)
    val total = r.values.sum
    // every division truncates at most 1 ppb per row per round; with
    // 7 nodes x 14 directed edges x 5 rounds the loss bound is tiny
    assert(total <= Graph.ScalePpb)
    assert(total > Graph.ScalePpb - 10000L, s"mass leaked: $total")
  }

  test("pagerank: heavier edge weight pulls rank — same topology, different w") {
    // two hubs with two leaves each; hub 0's edges weigh 3x hub 10's
    val g = Seq((0L, 1L, 3L), (0L, 2L, 3L), (10L, 11L, 1L), (10L, 12L, 1L),
      (0L, 10L, 1L)) // bridge so the graph is connected
    val r = ranksOf(g)
    assert(r(0L) > r(10L), "the heavier-degree hub must outrank")
  }

  test("pagerank gate: one row per supplier, ranks positive, ordered desc") {
    val rows = Graph.qPagerank(spark, Sf0001).collect()
    val nSupp = graft.sources.Tables.supplier(spark, Sf0001).count()
    assert(rows.length == nSupp)
    assert(rows.forall(_.getLong(1) > 0L))
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sorted.reverse)
  }

  test("gap_fill: per-user days are consecutive and carried values match the last observation") {
    val df = Temporal.qGapFill(spark, Sf001).cache()
    try {
      // no holes: per user, row count == max(day) - min(day) + 1
      val spans = df.groupBy($"user_id")
        .agg(count(lit(1)).as("n"), (max($"day") - min($"day") + 1).as("span"))
      assert(spans.filter($"n" =!= $"span").isEmpty)
      // every gap row (is_obs = 0) carries exactly the previous day's val
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"day")
      val lagged = df.withColumn("prev_val", lag($"val", 1).over(w))
      assert(lagged.filter($"is_obs" === 0 && $"val" =!= $"prev_val").isEmpty)
      // first row per user is always an observation
      assert(lagged.filter($"prev_val".isNull && $"is_obs" === 0).isEmpty)
    } finally df.unpersist()
  }

  test("scd2: intervals chain without gaps, collapse runs, and close exactly once per customer") {
    val df = Temporal.qScd2(spark, Sf001).cache()
    try {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_custkey").orderBy($"version")
      val chained = df.withColumn("next_from", lead($"valid_from_ms", 1).over(w))
        .withColumn("next_prio", lead($"prio", 1).over(w))
      // valid_to of every non-current interval equals the next interval's from
      assert(chained.filter($"is_current" === 0 && $"valid_to_ms" =!= $"next_from").isEmpty)
      // exactly one open interval per customer
      assert(df.filter($"is_current" === 1).groupBy($"c_custkey")
        .count().filter($"count" =!= 1).isEmpty)
      // runs collapsed: consecutive intervals always change priority
      assert(chained.filter($"next_prio".isNotNull && $"prio" === $"next_prio").isEmpty)
      // interval order mass: n_orders sums back to the order count
      val total = df.agg(sum($"n_orders")).head.getLong(0)
      assert(total == graft.sources.Tables.orders(spark, Sf001).count())
    } finally df.unpersist()
  }

  test("edit_verify: sim bounds, threshold flag consistency, and a planted near-dup scores high") {
    val df = Dedup.qEditVerify(spark, Sf001).cache()
    try {
      assert(df.filter($"edit_sim" < 0.0 || $"edit_sim" > 1.0).isEmpty)
      assert(df.filter(($"edit_sim" >= 0.8) =!= ($"near_exact" === 1)).isEmpty)
      // the LSH pair set at sf0.01 is the planted near-dup family —
      // shingle-level dups are near-verbatim, so edit distance must
      // agree for at least one pair (order-preserving duplication)
      assert(df.filter($"near_exact" === 1).count() > 0)
    } finally df.unpersist()
  }

  test("k_anonymity: ungeneralized released groups meet K, generalized pool at '*'") {
    val df = Analytics.qKAnonymity(spark, Sf001).cache()
    try {
      assert(df.filter($"release_segment" =!= "*" && $"n_rows" < Analytics.AnonK).isEmpty,
        "a released fine group under K must have generalized")
      // '*' groups pool >= 1 source group each; flag consistency
      assert(df.filter(($"n_rows" < Analytics.AnonK || $"l_diversity" < Analytics.AnonL)
        =!= ($"still_at_risk" === 1)).isEmpty)
      // total mass is preserved: rows across released groups = customers
      val total = df.agg(sum($"n_rows")).head.getLong(0)
      assert(total == graft.sources.Tables.customer(spark, Sf001).count())
    } finally df.unpersist()
  }
}
