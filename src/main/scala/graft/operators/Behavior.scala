package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Hashing
import graft.sources.Tables

/**
 * Product / user-behavior analytics over the events stream — the
 * dashboard family the reference's KPI views imply (arch doc:2243-2272
 * `v_trade_performance`, per-strategy rollups) generalized to the three
 * classic event-log queries every analytics engine ships: cohort
 * retention, time-decayed engagement, and experiment sample-ratio
 * checks.
 *
 * Determinism rules of the house: week/day arithmetic is integer
 * micros (exact in both engines), decay weights are negative powers of
 * two (an IEEE double times 2^-k is an exponent shift — exact), sums
 * cross decimal casts (order-free), and every emitted ratio is a
 * single IEEE divide of exact integers or decimals.
 */
object Behavior {
  import Relational.ColInterp

  private val WeekMicros = 7L * 86400L * 1000000L

  /** Epoch week of `ts` — integer micros FLOOR-divided, bit-identical
    * to DuckDB's `epoch_us(ts) // 604800000000` for any timestamp:
    * Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * so the pre-1970 case is made explicit by subtracting the
    * always-non-negative `pmod` remainder first (exact int64; for
    * ts ≥ epoch the two forms coincide). */
  private def weekCol = expr(
    s"(unix_micros(ts) - pmod(unix_micros(ts), $WeekMicros)) div $WeekMicros")

  // ------------------------------------------------------------------
  // Cohort retention (the weekly retention triangle): users are
  // cohorted by their first active week; each later active week counts
  // toward (cohort_week, week_offset). Scale shape: the ONLY
  // corpus-sized shuffle is the distinct over slim (user_id, week)
  // rows (map-side partial distinct); the cohort min and the join back
  // are keyed on user_id over already-distinct rows; the final rollup
  // is |cohorts|·|weeks| — tiny at any corpus size. No windows over
  // raw events, no collect.
  // ------------------------------------------------------------------
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select($"user_id", weekCol.as("week"))
      .distinct()
    val cohort = act.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    val cells = act.join(cohort, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // offset 0 is the cohort's own first week, so cohort_size always
    // resolves; the window runs over the tiny rollup, not the events
    val w = Window.partitionBy($"cohort_week")
    cells
      .withColumn("cohort_size",
        max(when($"week_offset" === 0, $"n_active")).over(w))
      .withColumn("retention",
        $"n_active".cast("double") / $"cohort_size".cast("double"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val sqlRetention: String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekMicros AS week FROM events),
       |coh AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1),
       |cells AS (
       |  SELECT cohort_week, week - cohort_week AS week_offset,
       |    count(*)::BIGINT AS n_active
       |  FROM act JOIN coh USING (user_id) GROUP BY 1, 2)
       |SELECT cohort_week, week_offset, n_active,
       |  (max(CASE WHEN week_offset = 0 THEN n_active END)
       |     OVER (PARTITION BY cohort_week))::BIGINT AS cohort_size,
       |  n_active::DOUBLE / (max(CASE WHEN week_offset = 0 THEN n_active END)
       |     OVER (PARTITION BY cohort_week))::DOUBLE AS retention
       |FROM cells ORDER BY cohort_week, week_offset""".stripMargin

  // ------------------------------------------------------------------
  // Time-decayed engagement score: score(user) = Σ value·2^-k where
  // k = full weeks since the event, anchored at the corpus's newest
  // event (half-life = one week). The weight is a negative power of
  // two, so value·2^-k is EXACT in IEEE doubles (pure exponent shift);
  // per-term decimal casts make the per-user sum shuffle-order free
  // (dsum convention). Weights below 2^-40 are exactly zero — beyond
  // decimal(28,12) resolution anyway — which also bounds the shift.
  // Scale shape: one single-row max-day aggregate broadcast back
  // (crossJoin of a 1-row frame), then one user-keyed partial-agg
  // shuffle. Nothing else moves.
  // ------------------------------------------------------------------
  val DecayCapWeeks = 40

  def qDecayScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select($"user_id", $"value", weekCol.as("week"))
    val anchor = ev.agg(max($"week").as("anchor_week"))
    val k = least($"anchor_week" - $"week", lit(DecayCapWeeks.toLong))
    val term = when(k >= DecayCapWeeks, lit(0.0))
      .otherwise($"value" * (lit(1.0) / expr("shiftleft(1L, cast(k as int))")))
    ev.crossJoin(broadcast(anchor))
      .withColumn("k", k)
      .withColumn("term", term)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max($"week").as("last_week"),
        sum($"term".cast(DecimalType(28, 12)))
          .cast(DecimalType(38, 6)).cast("double").as("score"))
      .orderBy($"user_id")
  }

  // least() clamps the oracle's shift even though the CASE already
  // zeroes the capped branch: a vectorized engine may evaluate both arms
  val sqlDecayScore: String =
    s"""WITH ev AS (
       |  SELECT user_id, value, epoch_us(ts) // $WeekMicros AS week FROM events),
       |a AS (SELECT max(week) AS anchor_week FROM ev),
       |t AS (
       |  SELECT user_id, week,
       |    CASE WHEN anchor_week - week >= $DecayCapWeeks THEN 0.0::DOUBLE
       |         ELSE value * (1.0::DOUBLE /
       |           (1::BIGINT << least(anchor_week - week, $DecayCapWeeks))::DOUBLE)
       |         END AS term
       |  FROM ev CROSS JOIN a)
       |SELECT user_id, count(*)::BIGINT AS n_events, max(week) AS last_week,
       |  CAST(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DECIMAL(38,6)) AS DOUBLE)
       |    AS score
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // A/B bucketing + sample-ratio-mismatch check (the experimentation
  // sanity gate: Kohavi et al., "Trustworthy Online Controlled
  // Experiments" §21 — an SRM means the assignment or logging is
  // broken and every downstream metric is garbage). Users are assigned
  // 50/50 by the engine's cross-engine h60 hash (sha-derived — NOT
  // murmur, so the DuckDB oracle reproduces assignments bit-for-bit).
  // Emitted per event_type and for the '__users__' exposure row:
  // per-arm counts and the 2-cell equal-split chi-square statistic
  // (n0-n1)²/(n0+n1) — exact integers, one IEEE divide.
  // Scale shape: assignment is per-row expression work; counts are
  // map-side-combined partials over |event_type| groups; the user
  // exposure row rides the same distinct shape as retention.
  // ------------------------------------------------------------------
  def qSrmCheck(spark: SparkSession, dir: String): DataFrame = {
    val armed = Tables.events(spark, dir)
      .select($"user_id", $"event_type",
        pmod(Hashing.h60($"user_id".cast("string")), lit(2)).as("arm"))
    def counts(df: DataFrame) = df.agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n0"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n1"))
    val byType = armed.groupBy($"event_type")
      .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("n0"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n1"))
    val users = counts(armed.select($"user_id", $"arm").distinct())
      .select(lit("__users__").as("event_type"), $"n0", $"n1")
    byType.unionByName(users)
      .withColumn("chi2",
        (($"n0" - $"n1") * ($"n0" - $"n1")).cast("double") /
          ($"n0" + $"n1").cast("double"))
      .orderBy($"event_type")
  }

  // ------------------------------------------------------------------
  // Event-flow transition matrix (the Sankey/Markov feed of product
  // analytics; first-order user-journey model): for each ordered pair
  // of event types, how often does a user's NEXT event follow the
  // current one, and with what conditional probability. Transitions
  // order on (ts, event_id) — the funnel family's tie-break — so
  // same-second neighbors resolve identically cross-engine; p is one
  // IEEE divide of exact window-summed int64 counts. Scale shape: ONE
  // user-keyed shuffle for the lead() window over slim (user, ts, id,
  // type) rows, then a map-side-combined |types|² aggregate; the
  // probability window runs over the tiny matrix frame.
  // ------------------------------------------------------------------
  def qEventFlow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val counts = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", $"n".cast("double") /
        sum($"n").over(Window.partitionBy($"from_type")).cast("double"))
      .orderBy($"from_type", $"to_type")
  }

  // ------------------------------------------------------------------
  // Last-touch attribution (the marketing-analytics standard: each
  // conversion credits the latest preceding touch event): for every
  // purchase, the most recent prior click by the same user, with the
  // gap in seconds; unattributed purchases keep NULL touch columns.
  // The "latest prior" is last_value-ignore-nulls over the funnel
  // family's total (ts, event_id) order, so both engines pick the
  // identical row (and both touch columns come from that one row).
  // Scale shape: ONE user-keyed shuffle for the running-last window
  // over slim rows, then a purchase-only projection — no join at all
  // (the join-free running-last trick of [[Temporal.qAsofJoin]]).
  // ------------------------------------------------------------------
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def lastClick(c: org.apache.spark.sql.Column) =
      last(when($"event_type" === "click", c), ignoreNulls = true).over(w)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .withColumn("click_ts", lastClick($"ts_s"))
      .withColumn("click_id", lastClick($"event_id"))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"ts_s".as("t_purchase"), $"click_id", $"click_ts",
        ($"ts_s" - $"click_ts").as("gap_secs"))
      .orderBy($"user_id", $"purchase_id")
  }

  val sqlAttribution: String =
    s"""WITH e AS (SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s,
       |    event_type FROM events),
       |a AS (SELECT user_id, event_id, ts_s, event_type,
       |    last_value(CASE WHEN event_type = 'click' THEN ts_s END IGNORE NULLS)
       |      OVER w AS click_ts,
       |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
       |      OVER w AS click_id
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id AS purchase_id, ts_s AS t_purchase,
       |  click_id, click_ts, (ts_s - click_ts)::BIGINT AS gap_secs
       |FROM a WHERE event_type = 'purchase'
       |ORDER BY user_id, purchase_id""".stripMargin

  val sqlEventFlow: String =
    s"""WITH e AS (SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s,
       |    event_type FROM events),
       |t AS (SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
       |      AS to_type
       |  FROM e),
       |c AS (SELECT from_type, to_type, count(*)::BIGINT AS n FROM t
       |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n,
       |  n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE AS p
       |FROM c ORDER BY from_type, to_type""".stripMargin

  val sqlSrmCheck: String = {
    val arm = s"(${Hashing.sqlH60("user_id::VARCHAR")}) % 2"
    s"""WITH armed AS (SELECT user_id, event_type, $arm AS arm FROM events),
       |rows_ AS (
       |  SELECT event_type,
       |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
       |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
       |  FROM armed GROUP BY 1
       |  UNION ALL
       |  SELECT '__users__',
       |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT,
       |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT
       |  FROM (SELECT DISTINCT user_id, arm FROM armed))
       |SELECT event_type, n0, n1,
       |  ((n0 - n1) * (n0 - n1))::DOUBLE / (n0 + n1)::DOUBLE AS chi2
       |FROM rows_ ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // Top session paths (X142): the product-analytics artifact the
  // transition matrix (X119) can't give — WHOLE journeys, not pairwise
  // hops. Sessions split on the 30-min inactivity gap (the exact
  // qSessionize convention), each session becomes its ordered
  // event-type path truncated at PathLen steps (the standard
  // path-explosion bound: |types|^PathLen distinct paths max,
  // corpus-independent), and the gate emits the PathTopK most frequent
  // paths. Ordering inside a session rides sort_array over collected
  // (ts, id, type) structs — deterministic under the funnel family's
  // total order; the rollup is a map-side-combinable count over
  // bounded-length strings.
  // ------------------------------------------------------------------
  val PathGapS = 1800L
  val PathLen = 8
  val PathTopK = 20

  def qTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val run = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .withColumn("gap", $"ts_s" - lag($"ts_s", 1).over(byTs))
      .withColumn("new_session",
        when($"gap".isNull || $"gap" > PathGapS, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"new_session").over(run))
      .groupBy($"user_id", $"session_idx")
      .agg(sort_array(collect_list(struct($"ts_s", $"event_id", $"event_type")))
        .as("evs"))
      .select(array_join(
        slice(transform($"evs", e => e.getField("event_type")), 1, PathLen),
        ">").as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(PathTopK)
  }

  val sqlTopPaths: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s, event_type,
       |    CASE WHEN (epoch_ms(ts) // 1000)
       |        - lag((epoch_ms(ts) // 1000)) OVER w IS NULL
       |      OR (epoch_ms(ts) // 1000)
       |        - lag((epoch_ms(ts) // 1000)) OVER w > $PathGapS
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
       |s AS (
       |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
       |    ORDER BY ts_s, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS session_idx
       |  FROM g),
       |paths AS (
       |  SELECT array_to_string(
       |    (list(event_type ORDER BY ts_s, event_id))[1:$PathLen], '>') AS path
       |  FROM s GROUP BY user_id, session_idx)
       |SELECT path, count(*) AS n_sessions
       |FROM paths GROUP BY 1
       |ORDER BY n_sessions DESC, path
       |LIMIT $PathTopK""".stripMargin

  // ------------------------------------------------------------------
  // Cohort lifetime value (X202 — the revenue companion of X105's
  // retention triangle: retention counts WHO came back, LTV integrates
  // WHAT they spent — cumulative purchase cents per (signup-cohort,
  // week-offset) divided by cohort size, the payback-curve every
  // growth/finance dashboard plots against acquisition cost. Cohort =
  // the user's first PURCHASE week (exact integer week arithmetic,
  // the X105 convention); cells aggregate map-side to |cohorts|×
  // |offsets| rows, the cumulative window and the per-cohort size
  // join run over that tiny frame only; ltv is truncating integer
  // division of exact cents — hash-exact cross-engine.
  // ------------------------------------------------------------------
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val cents = ($"value".cast(DecimalType(18, 6)) * 100).cast("long")
    val p = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", weekCol.as("week"), cents.as("cents"))
    val cohort = p.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    val sizes = cohort.groupBy($"cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val cells = p.join(cohort, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(sum($"cents").as("cents"))
    val cum = Window.partitionBy($"cohort_week").orderBy($"week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum($"cents").over(cum))
      .join(broadcast(sizes), "cohort_week")
      .select($"cohort_week", $"week_offset", $"cents", $"cum_cents",
        $"cohort_size", expr("cum_cents div cohort_size").as("ltv_cents"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val sqlCohortLtv: String =
    s"""WITH p AS (
       |  SELECT user_id, epoch_us(ts) // $WeekMicros AS week,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |coh AS (SELECT user_id, min(week) AS cohort_week FROM p GROUP BY 1),
       |sizes AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size
       |  FROM coh GROUP BY 1),
       |cells AS (
       |  SELECT cohort_week, week - cohort_week AS week_offset,
       |    CAST(sum(cents) AS BIGINT) AS cents
       |  FROM p JOIN coh USING (user_id) GROUP BY 1, 2),
       |cum AS (
       |  SELECT cohort_week, week_offset, cents,
       |    CAST(sum(cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_cents
       |  FROM cells)
       |SELECT cohort_week, week_offset, cents, cum_cents, cohort_size,
       |  cum_cents // cohort_size AS ltv_cents
       |FROM cum JOIN sizes USING (cohort_week)
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ------------------------------------------------------------------
  // Conversion-latency percentiles (X204 — the time-to-convert
  // distribution behind funnel SLOs and attribution windows: "how
  // long from the last view to the purchase", the latency twin of
  // X103's ordered funnel and X121's last-touch credit. Each purchase
  // pairs with its user's LATEST preceding view via the running
  // max-of-view-timestamps window (the X121 running-last shape —
  // view timestamps are increasing in event order, so max ≡ last,
  // sidestepping IGNORE NULLS dialect differences entirely); per
  // purchase DAY, exact order-statistic p50/p95 of the latency in
  // micros (the X158 rank ≥ ceil(q·n) pattern, deterministic
  // tie-break, no interpolation). Day-partitioned windows; one
  // user-keyed shuffle then one day-keyed shuffle of slim rows.
  // ------------------------------------------------------------------
  def qConvertLatency(spark: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lat = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .withColumn("view_us",
        max(when($"event_type" === "view", $"ts_us")).over(wu))
      .filter($"event_type" === "purchase" && $"view_us".isNotNull)
      .select($"user_id", $"event_id",
        ($"ts_us" - $"view_us").as("lat_us"),
        expr("ts_us div 86400000000").as("day"))
    val w = Window.partitionBy($"day").orderBy($"lat_us", $"user_id", $"event_id")
    val ranked = lat
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"day")))
    def orderStat(q: Double) =
      min(when($"rn" >= ceil(lit(q) * $"n").cast("long"), $"lat_us"))
    ranked.groupBy($"day")
      .agg(count(lit(1)).as("n_conversions"),
        orderStat(0.5).as("p50_us"), orderStat(0.95).as("p95_us"),
        max($"lat_us").as("max_us"))
      .orderBy($"day")
  }

  val sqlConvertLatency: String = {
    def os(q: Double) =
      s"min(lat_us) FILTER (WHERE rn >= CAST(ceil($q * n) AS BIGINT))"
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
       |    max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER
       |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_us
       |  FROM events),
       |lat AS (
       |  SELECT user_id, event_id, ts_us - view_us AS lat_us,
       |    ts_us // 86400000000 AS day
       |  FROM ev WHERE event_type = 'purchase' AND view_us IS NOT NULL),
       |r AS (
       |  SELECT day, lat_us,
       |    row_number() OVER (PARTITION BY day
       |      ORDER BY lat_us, user_id, event_id) AS rn,
       |    count(*) OVER (PARTITION BY day) AS n
       |  FROM lat)
       |SELECT day, count(*)::BIGINT AS n_conversions,
       |  ${os(0.5)} AS p50_us, ${os(0.95)} AS p95_us, max(lat_us) AS max_us
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // User feature-store materialization (X207 — the composition a
  // feature-engineering pipeline actually ships to a training run or
  // online store: ONE row per user carrying the engagement features
  // the individual gates compute separately — event/view/purchase
  // counts, 30-min-gap session count (the qSessionize convention),
  // purchase cents, recency vs the corpus clock, and the exact-ppm
  // view→purchase conversion rate. The integration risks a composed
  // feature job carries (clock anchoring, per-user joins drifting,
  // ratio denominators) get one gate here, the X175 capstone stance
  // applied to the behavioral family. Scale shape: the session count
  // and the aggregate family share ONE hashpartitioning(user_id) —
  // the lag window, its rollup and the count aggregate all key the
  // same way, and the final join is user-keyed; the clock is a
  // broadcast 1-row max.
  // ------------------------------------------------------------------
  /** The X207 event projection — shared with the streaming
    * maintenance spec so online and offline read the same rows. */
  def featureEvents(spark: SparkSession, dir: String): DataFrame = {
    val cents = ($"value".cast(DecimalType(18, 6)) * 100).cast("long")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_millis(ts) div 1000").as("ts_s"), cents.as("cents"))
  }

  /** The X207 feature construction over an arbitrary event frame —
    * factored so the gate and the X212 streaming-maintenance pin
    * share it. */
  def featureFrame(ev: DataFrame): DataFrame = {
    val anchor = ev.agg(max(expr("ts_s div 86400")).as("maxday"))
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val sess = ev
      .withColumn("gap", $"ts_s" - lag($"ts_s", 1).over(byUser))
      .withColumn("new_session",
        when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .groupBy($"user_id").agg(sum($"new_session").as("n_sessions"))
    val agg = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(when($"event_type" === "purchase", $"cents").otherwise(0L))
          .as("purchase_cents"),
        max(expr("ts_s div 86400")).as("lastday"))
    agg.join(sess, "user_id")
      .crossJoin(broadcast(anchor))
      .select($"user_id", $"n_events", $"n_sessions", $"n_views",
        $"n_purchases", $"purchase_cents",
        ($"maxday" - $"lastday").as("recency_days"),
        expr("(n_purchases * 1000000) div greatest(n_views, 1)")
          .as("conv_ppm"))
      .orderBy($"user_id")
  }

  def qFeatureStore(spark: SparkSession, dir: String): DataFrame =
    featureFrame(featureEvents(spark, dir))

  val sqlFeatureStore: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type,
       |    (epoch_ms(ts) // 1000) AS ts_s,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |a AS (SELECT max(ts_s // 86400) AS maxday FROM ev),
       |g AS (
       |  SELECT user_id,
       |    CASE WHEN ts_s - lag(ts_s) OVER w IS NULL
       |      OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS ns
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
       |sess AS (SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions
       |  FROM g GROUP BY 1),
       |agg AS (
       |  SELECT user_id, count(*)::BIGINT AS n_events,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
       |      AS n_views,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
       |      AS n_purchases,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
       |      ELSE 0 END) AS BIGINT) AS purchase_cents,
       |    max(ts_s // 86400) AS lastday
       |  FROM ev GROUP BY 1)
       |SELECT user_id, n_events, n_sessions, n_views, n_purchases,
       |  purchase_cents, maxday - lastday AS recency_days,
       |  (n_purchases * 1000000) // greatest(n_views, 1) AS conv_ppm
       |FROM agg JOIN sess USING (user_id) CROSS JOIN a
       |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // RFM customer segmentation (X190 — Hughes 1994, the
  // recency/frequency/monetary tiering every CRM and lifecycle-
  // marketing stack computes over its order log; the reference's KPI
  // family, arch doc:2243-2249, grouped per entity): per customer the
  // three raw metrics, each mapped to a 1–5 quintile tier (1 = best),
  // and the composite 3-digit segment code. NO corpus-wide rank
  // window: tiers come from per-metric VALUE HISTOGRAMS — recency
  // days bounded by the date span, frequency by the per-customer
  // order cap, and monetary pre-quantized onto a 1000-cell grid via a
  // broadcast max — so the cumulative windows run over bounded frames
  // (the X57/X75 bucket-granular boundary pattern: ties share a
  // bucket, the cut lands at bucket resolution, deterministically)
  // and broadcast back onto the customer frame. Monetary grid math:
  // m·1000 stays under 2⁶³ for per-customer lifetime value below
  // ~9·10¹⁵ cents — documented headroom, not a corpus bound.
  // ------------------------------------------------------------------
  val RfmMonetaryGrid = 1000L

  /** (value, tier) over the metric's value histogram: quintile
    * boundaries at ceil(k·tot/5) cumulative docs in goodness order. */
  private def rfmTiers(per: DataFrame, c: String, asc: Boolean): DataFrame = {
    val ord = if (asc) col(c).asc else col(c).desc
    val wCum = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    per.groupBy(col(c)).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum($"n").over(wCum))
      .withColumn("tot", sum($"n").over(wTot))
      .select(col(c),
        when($"cum" <= expr("(tot + 4) div 5"), 1L)
          .when($"cum" <= expr("(2 * tot + 4) div 5"), 2L)
          .when($"cum" <= expr("(3 * tot + 4) div 5"), 3L)
          .when($"cum" <= expr("(4 * tot + 4) div 5"), 4L)
          .otherwise(5L).as(s"${c}_tier"))
  }

  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val cents = ($"o_totalprice".cast(DecimalType(18, 6)) * 100).cast("long")
    val o = Tables.orders(spark, dir)
      .select($"o_custkey",
        // o_orderdate is TIMESTAMP_NTZ; session tz UTC makes the cast
        // an identity relabel (the qDateFuncs convention)
        expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").as("day"),
        cents.as("cents"))
    val anchor = o.agg(max($"day").as("maxday"))
    val per0 = o.groupBy($"o_custkey")
      .agg(max($"day").as("lastday"), count(lit(1)).as("freq"),
        sum($"cents").as("m"))
      .crossJoin(broadcast(anchor))
      .select($"o_custkey".as("custkey"), ($"maxday" - $"lastday").as("r_days"),
        $"freq", $"m")
    val mMax = per0.agg(max($"m").as("maxm"))
    val per = per0.crossJoin(broadcast(mMax))
      .select($"custkey", $"r_days", $"freq", $"m",
        expr(s"(m * $RfmMonetaryGrid) div (maxm + 1)").as("mb"))
    per
      .join(broadcast(rfmTiers(per, "r_days", asc = true)), "r_days")
      .join(broadcast(rfmTiers(per, "freq", asc = false)), "freq")
      .join(broadcast(rfmTiers(per, "mb", asc = false)), "mb")
      .select($"custkey", $"r_days", $"freq", $"m".as("monetary_cents"),
        $"r_days_tier".as("r_tier"), $"freq_tier".as("f_tier"),
        $"mb_tier".as("m_tier"),
        ($"r_days_tier" * 100 + $"freq_tier" * 10 + $"mb_tier").as("rfm"))
      .orderBy($"custkey")
  }

  private def sqlRfmTier(src: String, v: String, goodOrd: String): String =
    s"""SELECT $v AS v,
       |    CASE WHEN cum <= (tot + 4) // 5 THEN 1
       |         WHEN cum <= (2 * tot + 4) // 5 THEN 2
       |         WHEN cum <= (3 * tot + 4) // 5 THEN 3
       |         WHEN cum <= (4 * tot + 4) // 5 THEN 4
       |         ELSE 5 END::BIGINT AS tier
       |  FROM (SELECT $v, sum(n) OVER (ORDER BY $v $goodOrd
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |          sum(n) OVER () AS tot
       |        FROM (SELECT $v, count(*)::BIGINT AS n FROM $src GROUP BY 1))""".stripMargin

  val sqlRfm: String =
    s"""WITH o AS (
       |  SELECT o_custkey, (epoch_ms(o_orderdate) // 86400000) AS day,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
       |  FROM orders),
       |a AS (SELECT max(day) AS maxday FROM o),
       |per0 AS (
       |  SELECT o_custkey AS custkey, maxday - max(day) AS r_days,
       |    count(*)::BIGINT AS freq, CAST(sum(cents) AS BIGINT) AS m
       |  FROM o CROSS JOIN a GROUP BY 1, maxday),
       |mm AS (SELECT max(m) AS maxm FROM per0),
       |per AS (SELECT custkey, r_days, freq, m,
       |    (m * $RfmMonetaryGrid) // (maxm + 1) AS mb
       |  FROM per0 CROSS JOIN mm),
       |rt AS (${sqlRfmTier("per", "r_days", "ASC")}),
       |ft AS (${sqlRfmTier("per", "freq", "DESC")}),
       |mt AS (${sqlRfmTier("per", "mb", "DESC")})
       |SELECT custkey, r_days, freq, m AS monetary_cents,
       |  rt.tier AS r_tier, ft.tier AS f_tier, mt.tier AS m_tier,
       |  rt.tier * 100 + ft.tier * 10 + mt.tier AS rfm
       |FROM per
       |JOIN rt ON per.r_days = rt.v
       |JOIN ft ON per.freq = ft.v
       |JOIN mt ON per.mb = mt.v
       |ORDER BY custkey""".stripMargin

  // ------------------------------------------------------------------
  // Peak session concurrency (X189 — the interval sweep-line query
  // behind capacity planning and license/SLA audits: "how many
  // sessions were open at once, per day"): sessions are the standard
  // 30-min-gap islands (the qSessionize convention, all users), each
  // contributing a +1 delta at its start second and a −1 at its end
  // second; the open count at any boundary is the running sum. The
  // DISTRIBUTED sweep never builds one global ordered stream: deltas
  // key by epoch day, each day's running sum is a day-partitioned
  // window, and the cross-day carry (sessions still open at
  // midnight) is the cumulative delta sum over the DAY table — a
  // bounded frame (date span), the two-level decomposition that keeps
  // the sweep one keyed shuffle at any scale. Ties are total-ordered
  // (second, +1 before −1, user, session): a session ending the exact
  // second another starts counts as overlapping — closed-interval
  // semantics, deterministic in both engines.
  // ------------------------------------------------------------------
  def qMaxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val sess = Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("unix_millis(ts) div 1000").as("ts_s"))
      .withColumn("gap", $"ts_s" - lag($"ts_s", 1).over(byUser))
      .withColumn("new_session",
        when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("sess", sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess")
      .agg(min($"ts_s").as("start_s"), max($"ts_s").as("end_s"))
    // Both sweep deltas come off ONE pass over the session frame: the
    // previous unionByName(sess, sess) re-ran the whole two-window
    // sessionization once per branch (row set identical — each session
    // still emits exactly one +1 at start_s and one −1 at end_s).
    val deltas = sess
      .select($"user_id", $"sess", explode(array(
        struct($"start_s".as("t"), lit(1L).as("d")),
        struct($"end_s".as("t"), lit(-1L).as("d")))).as("td"))
      .select($"user_id", $"sess", $"td.t".as("t"), $"td.d".as("d"))
      .withColumn("day", expr("t div 86400"))
    // carry-in per day: cumulative delta mass of all PRIOR days —
    // a window over the bounded day table only
    val wDays = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = deltas.groupBy($"day").agg(sum($"d").as("dsum"))
      .withColumn("carry", coalesce(sum($"dsum").over(wDays), lit(0L)))
      .select($"day", $"carry")
    // within-day running sum at every delta point, total tie order
    val wSweep = Window.partitionBy($"day")
      .orderBy($"t", $"d".desc, $"user_id", $"sess")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("run", sum($"d").over(wSweep))
      .join(broadcast(carry), "day")
      .groupBy($"day")
      .agg(max($"run" + $"carry").as("max_concurrent"),
        sum(when($"d" === 1L, 1L).otherwise(0L)).as("n_starts"))
      .orderBy($"day")
  }

  val sqlMaxConcurrency: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s,
       |    CASE WHEN (epoch_ms(ts) // 1000)
       |        - lag((epoch_ms(ts) // 1000)) OVER w IS NULL
       |      OR (epoch_ms(ts) // 1000)
       |        - lag((epoch_ms(ts) // 1000)) OVER w > 1800
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
       |s AS (
       |  SELECT user_id, ts_s,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id
       |      ORDER BY ts_s, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
       |  FROM g),
       |sb AS (SELECT user_id, sess, min(ts_s) AS start_s, max(ts_s) AS end_s
       |  FROM s GROUP BY 1, 2),
       |deltas AS (
       |  SELECT user_id, sess, start_s AS t, 1::BIGINT AS d FROM sb
       |  UNION ALL
       |  SELECT user_id, sess, end_s AS t, -1::BIGINT AS d FROM sb),
       |dd AS (SELECT *, t // 86400 AS day FROM deltas),
       |carry AS (
       |  SELECT day, coalesce(sum(dsum) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS carry
       |  FROM (SELECT day, sum(d)::BIGINT AS dsum FROM dd GROUP BY 1)),
       |run AS (
       |  SELECT day, d,
       |    CAST(sum(d) OVER (PARTITION BY day
       |      ORDER BY t, d DESC, user_id, sess
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
       |  FROM dd)
       |SELECT run.day, max(run.run + carry.carry) AS max_concurrent,
       |  CAST(sum(CASE WHEN run.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
       |FROM run JOIN carry USING (day)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
