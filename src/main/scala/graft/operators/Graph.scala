package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Graph analytics over entity-interaction graphs — the link-authority
 * ranking a crawl/curation pipeline runs over its domain graph
 * (PageRank; Brin & Page 1998, "The anatomy of a large-scale
 * hypertextual Web search engine", §2.1) applied to the transaction
 * graph the relational tables already carry. The reference's analytics
 * side ranks entities by aggregate interaction (KPI rollups,
 * upbit-analysis arch doc:642-647); link authority is the standard
 * next step the flat aggregates can't express: a supplier serving few
 * but highly-connected customers outranks one serving many one-off
 * buyers.
 *
 * Scale-first design, 100 TB stance:
 *
 *  - The graph is EDGES IN A DATAFRAME, never an adjacency structure
 *    on the driver: one aggregation builds (src, dst, w) from the
 *    fact join, and each PageRank round is one equi-join
 *    (ranks ⋈ edges on src) + one aggregation (sum by dst) — the
 *    Pregel message-passing shape expressed declaratively, so every
 *    round shuffles on graph keys and AQE/ReuseExchange keep the
 *    repeated edge subtree a single materialized exchange instead of
 *    K re-scans.
 *
 *  - A FIXED round count (no convergence read-back): the plan is
 *    fully declarative — no driver-side loop state, no collect — and
 *    K=5 rounds of a damped walk on a bipartite transaction graph is
 *    within the standard 10^-2 tolerance band (power iteration
 *    contracts by the damping factor 0.85 per round).
 *
 *  - EXACT integer arithmetic in parts-per-billion: rank mass is a
 *    BIGINT ppb share, contributions divide by out-weight with
 *    truncating integer division — bit-identical in Spark (`div`) and
 *    DuckDB (`//`, truncating on BIGINT) for the all-positive values
 *    here, so the oracle is a hash-exact cross-engine check instead of
 *    a float tolerance. int64 headroom: rank ≤ 10^9, edge weight
 *    ≤ 10^6 at 100 TB ⇒ products ≤ 10^15 ≪ 2^63.
 *
 *  - The node count enters the plan as a broadcast 1-row aggregate
 *    (crossJoin(broadcast(...)) of a bounded scalar frame — the
 *    repo-wide pattern), never a driver read-back.
 */
object Graph {
  import Relational.ColInterp

  /** Rank mass scale: ranks are parts-per-billion shares of 1. */
  val ScalePpb = 1000000000L
  /** Damping factor 0.85 as an exact rational. */
  val DampNum = 85L
  val DampDen = 100L
  val Rounds = 5
  /** (1-d)·Scale, exact: 15·10⁹/100 divides evenly. Precomputed so the
    * SQL expression carries one bigint literal instead of an int32
    * product that overflows under ANSI. */
  val BasePpb: Long = (DampDen - DampNum) * ScalePpb / DampDen

  /**
   * Core power iteration over a directed edge frame (src, dst, w):
   * ranks r_{k+1}(v) = (1-d)/N + d * Σ_{u→v} (r_k(u)·w_uv) div W_u,
   * all in exact ppb integer arithmetic. The caller symmetrizes if an
   * undirected walk is wanted. Every node must appear as a src (true
   * after symmetrization) — nodes and out-weights both derive from
   * the edge frame, so there are no dangling-mass corrections.
   *
   * Takes an edge-frame FACTORY, not a frame: each round joins the
   * edge subtree against a ranks lineage that already embeds it, and a
   * reused frame (one set of attribute ids referenced K times through
   * its own lineage) trips Catalyst's Union constraint rewrite on
   * union-containing plans (key-not-found on deduplicated attributes —
   * the documented Clustering jump-join pitfall). Fresh frames have
   * fresh ids; the K edge subtrees still canonicalize identically, so
   * exchange reuse materializes the edge shuffle once at runtime.
   */
  def pagerankRanks(mkEdges: () => DataFrame, rounds: Int = Rounds): DataFrame = {
    // (src, dst, w, wout) with per-src out-weight attached.
    def e(): DataFrame = {
      val ed = mkEdges()
      ed.join(ed.groupBy($"src").agg(sum($"w").as("wout")), "src")
        .select($"src", $"dst", $"w", $"wout")
    }
    def nodes(): DataFrame = mkEdges().select($"src".as("id")).distinct()
    // 1-row node-count frame, broadcast into init and every round.
    def nfr(): DataFrame = nodes().agg(count(lit(1)).as("n"))
    var ranks = nodes()
      .crossJoin(broadcast(nfr()))
      .select($"id", expr(s"${ScalePpb}L div n").as("r"))
    for (_ <- 1 to rounds) {
      val contrib = e().join(ranks.select($"id", $"r"), $"src" === $"id")
        .groupBy($"dst")
        .agg(sum(expr("(r * w) div wout")).as("s"))
      ranks = contrib
        .crossJoin(broadcast(nfr()))
        .select($"dst".as("id"),
          expr(s"${BasePpb}L div n + ($DampNum * s) div $DampDen").as("r"))
    }
    ranks
  }

  /** Customer↔supplier interaction edges from the fact join, weighted
    * by lineitem count. Node ids are disjoint by parity:
    * customer = 2·custkey, supplier = 2·suppkey + 1. Symmetrized so
    * the walk is well-defined (no dangling sinks on the bipartite
    * graph). */
  def transactionEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val e0 = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
    e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst"), $"w"))
  }

  // ------------------------------------------------------------------
  // Gate: supplier authority ranking. Output one row per supplier with
  // its final ppb rank — the entity-importance artifact a curation
  // pipeline joins against (cf. domain-authority weighting in crawl
  // corpora).
  // ------------------------------------------------------------------
  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankRanks(() => transactionEdges(spark, dir))
      .filter($"id" % 2 === 1)
      .select((expr("id div 2")).as("s_suppkey"), $"r".as("rank_ppb"))
      .orderBy($"rank_ppb".desc, $"s_suppkey")

  /** Oracle: the identical walk unrolled as one CTE per round in
    * DuckDB (`//` truncates like Spark's `div` on the all-positive
    * BIGINTs here). */
  val sqlPagerank: String = {
    val base = s"$BasePpb // n"
    // sum(BIGINT) is HUGEINT in DuckDB — cast back so the rank column
    // stays BIGINT end to end (values ≤ 10⁹, the cast is exact).
    def round(k: Int): String =
      s"""r$k AS (
         |  SELECT e.dst AS id,
         |    $base + ($DampNum * CAST(sum((r.r * e.w) // e.wout) AS BIGINT))
         |      // $DampDen AS r
         |  FROM e JOIN r${k - 1} r ON e.src = r.id CROSS JOIN n
         |  GROUP BY e.dst, n.n)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       |    count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |sym AS (
       |  SELECT src, dst, w FROM e0
       |  UNION ALL SELECT dst, src, w FROM e0),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM sym GROUP BY 1),
       |e AS (SELECT s.src, s.dst, s.w, o.wout
       |      FROM sym s JOIN outw o ON s.src = o.src),
       |n AS (SELECT count(*) AS n FROM outw),
       |r0 AS (SELECT src AS id, $ScalePpb // n.n AS r FROM outw CROSS JOIN n),
       |${(1 to Rounds).map(round).mkString(",\n")}
       |SELECT id // 2 AS s_suppkey, r AS rank_ppb FROM r$Rounds
       |WHERE id % 2 = 1
       |ORDER BY rank_ppb DESC, s_suppkey""".stripMargin
  }
}
