package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/**
 * Event-time window operators over the `events` table — the batch
 * faces of SURVEY §2.7 W1–W3 / §2.4 A3–A4 (sliding event-time window,
 * trailing range baseline, previous-window trend). The streaming faces
 * (watermark + `window()` in a `readStream`) share these exact
 * expressions; see graft.streaming.
 *
 * Scale: window aggregations shuffle once on (window, key) with
 * map-side partial aggregation; the sliding window fan-out (w/slide
 * copies per row) happens *after* projection to (ts, key, value), so
 * the duplicated rows are narrow. Analytic (`over`) windows sort within
 * key partitions only — no global sort.
 */
object EventWindows {
  import Relational.ColInterp

  private val DEC = DecimalType(18, 6)
  private def dsum(c: Column): Column = sum(c.cast(DEC)).cast("double")
  private def wsum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DEC)).over(w).cast("double")

  // ------------------------------------------------------------------
  // W1/A3: sliding event-time window (10 min size, 5 min slide) —
  // per-type mean value. Epoch-aligned, same as the oracle's
  // arithmetic window assignment.
  // ------------------------------------------------------------------
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
      .agg(dsum($"value").as("sum_value"), count(lit(1)).as("n"))
      .select(unix_seconds($"window.start").as("window_start_s"),
        $"event_type", $"sum_value", $"n",
        ($"sum_value" / $"n").as("avg_value"))
      .orderBy($"window_start_s", $"event_type")

  val sqlSlidingWindow: String =
    """SELECT window_start_s, event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
      |FROM (
      |  SELECT ((epoch_ms(ts) // 1000) // 300 - i) * 300 AS window_start_s, event_type, value
      |  FROM (SELECT ts, event_type, value, unnest(range(0, 2)) AS i FROM events))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // W2/A4: trailing 1-hour range window per user — the rolling
  // baseline mean (CEP doc:111-149's 1-minute ask-volume baseline,
  // time-scaled to this table). RANGE frame on epoch seconds.
  // ------------------------------------------------------------------
  def qTrailingBaseline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts_s")
      .rangeBetween(-3600, 0)
    Tables.events(spark, dir)
      .filter($"user_id" < 30)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"value")
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("baseline", wsum($"value", w) / $"n_in_window")
      .orderBy($"user_id", $"ts_s", $"event_id")
  }

  val sqlTrailingBaseline: String =
    """SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s, value,
      |  count(*) OVER w AS n_in_window,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / (count(*) OVER w) AS baseline
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_ms(ts) // 1000)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_s, event_id""".stripMargin

  // ------------------------------------------------------------------
  // W3: previous-window comparison — daily per-type totals with lag,
  // delta, and a decline flag (the "two consecutive decreases" trend
  // primitive, arch doc:642-647).
  // ------------------------------------------------------------------
  private def windowTrendBase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"event_type").orderBy($"day_s")
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(dsum($"value").as("day_total"), count(lit(1)).as("n"))
      .select(unix_seconds($"window.start").as("day_s"), $"event_type", $"day_total", $"n")
      .withColumn("prev_total", lag($"day_total", 1).over(w))
      .withColumn("declined",
        when($"prev_total".isNotNull && $"day_total" < $"prev_total", 1L).otherwise(0L))
  }

  def qWindowTrend(spark: SparkSession, dir: String): DataFrame =
    windowTrendBase(spark, dir).orderBy($"event_type", $"day_s")

  val sqlWindowTrend: String =
    """WITH d AS (
      |  SELECT ((epoch_ms(ts) // 1000) // 86400) * 86400 AS day_s, event_type,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_total, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT day_s, event_type, day_total, n,
      |  lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s) AS prev_total,
      |  CASE WHEN lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s) IS NOT NULL
      |        AND day_total < lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s)
      |       THEN 1::BIGINT ELSE 0::BIGINT END AS declined
      |FROM d ORDER BY event_type, day_s""".stripMargin

  // ------------------------------------------------------------------
  // A3 composite: the decline-trend TRIGGER — window-over-window drop
  // in two consecutive windows ("평균 체결량이 감소 추세로 전환 …
  // 2회 연속 감소", arch doc:642-647, 기획 doc:132-134). The reference
  // keeps the previous window's mean in ValueState and fires on the
  // second successive drop; the batch face is a second lag over the
  // `declined` flag. Emits only firing rows (the signal stream).
  //
  // Scale: same single (window,key) shuffle as the base trend; the two
  // lags run in one per-key sort — no extra exchange, no state growth
  // beyond one previous-window flag per key.
  // ------------------------------------------------------------------
  def qDeclineTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"event_type").orderBy($"day_s")
    windowTrendBase(spark, dir)
      .withColumn("prev_declined", lag($"declined", 1).over(w))
      .filter($"declined" === 1L && $"prev_declined" === 1L)
      .select($"day_s", $"event_type", $"day_total", $"prev_total",
        lit(2L).as("declines_in_row"))
      .orderBy($"event_type", $"day_s")
  }

  val sqlDeclineTrend: String =
    """WITH d AS (
      |  SELECT ((epoch_ms(ts) // 1000) // 86400) * 86400 AS day_s, event_type,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_total, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT day_s, event_type, day_total,
      |    lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s) AS prev_total,
      |    CASE WHEN lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s) IS NOT NULL
      |          AND day_total < lag(day_total, 1) OVER (PARTITION BY event_type ORDER BY day_s)
      |         THEN 1::BIGINT ELSE 0::BIGINT END AS declined
      |  FROM d),
      |c AS (
      |  SELECT *, lag(declined, 1) OVER (PARTITION BY event_type ORDER BY day_s) AS prev_declined
      |  FROM t)
      |SELECT day_s, event_type, day_total, prev_total, 2::BIGINT AS declines_in_row
      |FROM c WHERE declined = 1 AND prev_declined = 1
      |ORDER BY event_type, day_s""".stripMargin

  // ------------------------------------------------------------------
  // Sessionization: gap-based sessions (30 min inactivity) per user —
  // the classic event-stream operator. This closed form matches the
  // SQL oracle and shows the islands-and-gaps encoding; the NATIVE
  // streaming face (watermarked `session_window()` aggregation) is
  // pinned stream ≡ batch against this gate in ReplayEquivalenceSpec
  // (gap 1801 s there, because session_window merges on gap < g while
  // this face splits on gap > 1800 — the two rules then coincide).
  // ------------------------------------------------------------------
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    Tables.events(spark, dir)
      .filter($"user_id" < 30)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"value")
      .withColumn("gap", $"ts_s" - lag($"ts_s", 1).over(byTs))
      .withColumn("new_session", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts_s").as("session_start_s"), max($"ts_s").as("session_end_s"),
        count(lit(1)).as("n_events"),
        sum($"value".cast(DEC)).cast("double").as("session_value"))
      .orderBy($"user_id", $"session_idx")
  }

  val sqlSessionize: String =
    """WITH g AS (
      |  SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s, value,
      |    CASE WHEN (epoch_ms(ts) // 1000) - lag((epoch_ms(ts) // 1000)) OVER
      |           (PARTITION BY user_id ORDER BY (epoch_ms(ts) // 1000), event_id) > 1800
      |         OR lag((epoch_ms(ts) // 1000)) OVER
      |           (PARTITION BY user_id ORDER BY (epoch_ms(ts) // 1000), event_id) IS NULL
      |         THEN 1::BIGINT ELSE 0::BIGINT END AS new_session
      |  FROM events WHERE user_id < 30),
      |s AS (
      |  SELECT user_id, event_id, ts_s, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
      |  FROM g)
      |SELECT user_id, session_idx, min(ts_s) AS session_start_s,
      |  max(ts_s) AS session_end_s, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Native session windows (X146): the SAME 30-min-gap sessionization
  // as [[qSessionize]], but expressed through Spark's built-in
  // `session_window` aggregation instead of the hand-rolled
  // gaps-and-islands windows — the declarative form that also runs
  // UNCHANGED as a streaming aggregation (session_window is Structured
  // Streaming's native merging session state, with watermark-driven
  // eviction). Full event table, no user cap: the session_window
  // aggregate is one user-keyed shuffle with merging partial sessions
  // — no lag/sum window pair, no second pass. The ORACLE is the
  // independent gaps-and-islands encoding (strict `gap >= 1800` opens
  // a session, matching session_window's half-open [start, last+gap)
  // merge rule), so agreement pins the built-in's semantics against
  // the textbook construction. Window end = last event + gap, the
  // session_window contract.
  // ------------------------------------------------------------------
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"value")
      .groupBy($"user_id", session_window($"ts", "1800 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DEC)).cast("double").as("session_value"))
      // event timestamps carry sub-second parts — everything stays at
      // exact microsecond resolution so the two encodings can't
      // diverge on a truncated gap
      .select($"user_id",
        unix_micros($"w.start").as("session_start_us"),
        unix_micros($"w.end").as("session_end_us"),
        $"n_events", $"session_value")
      .orderBy($"user_id", $"session_start_us")

  val sqlSessionWindow: String =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 1800000000
      |         OR lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
      |         THEN 1::BIGINT ELSE 0::BIGINT END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts_us, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |      AS session_idx
      |  FROM g)
      |SELECT user_id, min(ts_us) AS session_start_us,
      |  max(ts_us) + 1800000000 AS session_end_us, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_start_us""".stripMargin

  // ------------------------------------------------------------------
  // Ordered conversion funnel (view → click → purchase): per user, the
  // FIRST view, the first click strictly after it, and the first
  // purchase strictly after that click AND within FunnelWindowSecs of
  // the view — the MATCH_RECOGNIZE/CEP sequence query of product
  // analytics (the batch face of the reference's event-type dispatch
  // pipelines, SURVEY §2.3 P7–P8), expressed as per-stage keyed
  // windows instead of a row-pattern engine. "Strictly after" orders
  // on (ts_s, event_id) so same-second chains resolve identically in
  // both engines. Scale shape: each stage is one slim per-user window
  // over the type-FILTERED scan (the event_type predicate pushes to
  // parquet), all joins are user-keyed equi joins of per-user single
  // rows — no cross-user movement, no event explosion, and stage
  // frames shrink monotonically (funnel users ⊆ view users).
  // ------------------------------------------------------------------
  val FunnelWindowSecs = 3600L

  /** One stage of a sequence pattern: the event type to match, an
    * optional within-seconds bound measured from the FIRST stage's
    * event time (the MATCH_RECOGNIZE-style anchor window), and an
    * optional per-step bound measured from the PREVIOUS stage's event
    * time (the step-gap window — "click within 30 min of the view"). */
  final case class FunnelStage(eventType: String,
      withinSecs: Option[Long] = None, withinPrevSecs: Option[Long] = None)

  /** The 3-stage gate's definition — one instantiation of the generic
    * matcher, not a bespoke query. */
  val FunnelStages: Seq[FunnelStage] = Seq(
    FunnelStage("view"), FunnelStage("click"),
    FunnelStage("purchase", Some(FunnelWindowSecs)))

  /** 4-stage instantiation (view → click → signup → purchase within a
    * day) — proves the matcher is parameterized, not a 3-stage special
    * case. */
  val Funnel4WindowSecs = 86400L
  val Funnel4Stages: Seq[FunnelStage] = Seq(
    FunnelStage("view"), FunnelStage("click"), FunnelStage("signup"),
    FunnelStage("purchase", Some(Funnel4WindowSecs)))

  /** Per-step-bounded instantiation: anchor window on the whole chain
    * PLUS step-gap windows between consecutive stages. */
  val FunnelStepSecs = 1800L
  val FunnelStepStages: Seq[FunnelStage] = Seq(
    FunnelStage("view"),
    FunnelStage("click", withinPrevSecs = Some(FunnelStepSecs)),
    FunnelStage("purchase", Some(FunnelWindowSecs), Some(FunnelStepSecs)))

  private def eventsFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")

  /** Generic N-stage sequence matcher over (user_id, event_id, ts_s,
    * event_type) rows: per user, stage k matches the FIRST event of its
    * type strictly after stage k−1 (ordered on (ts_s, event_id) so
    * same-second chains resolve identically cross-engine) and within
    * `withinSecs` of the stage-0 anchor when bounded. Returns one frame
    * per stage: (user_id, t0, t<k>, id<k>) — users present in frame k
    * completed stages 0..k. Scale shape is per stage exactly the gate's
    * (X103): one slim per-user window over the type-FILTERED scan (the
    * event_type predicate pushes to parquet), user-keyed equi joins of
    * per-user single rows, frames shrinking monotonically. */
  def sequenceMatch(ev: DataFrame, stages: Seq[FunnelStage]): Seq[DataFrame] = {
    require(stages.nonEmpty, "sequence needs at least one stage")
    def firstPerUser(df: DataFrame, keep: Seq[Column]): DataFrame = {
      val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).select(keep: _*)
    }
    val s0 = firstPerUser(ev.filter($"event_type" === stages.head.eventType),
      Seq($"user_id", $"ts_s".as("t0"), $"event_id".as("id0")))
    stages.zipWithIndex.tail.scanLeft(s0) { case (prev, (st, i)) =>
      val cand = ev.filter($"event_type" === st.eventType)
        .join(prev, Seq("user_id"))
        .filter($"ts_s" > col(s"t${i - 1}") ||
          ($"ts_s" === col(s"t${i - 1}") && $"event_id" > col(s"id${i - 1}")))
      val anchored = st.withinSecs.fold(cand)(w => cand.filter($"ts_s" <= $"t0" + w))
      val bounded = st.withinPrevSecs.fold(anchored)(w =>
        anchored.filter($"ts_s" <= col(s"t${i - 1}") + w))
      firstPerUser(bounded,
        Seq($"user_id", $"t0", $"ts_s".as(s"t$i"), $"event_id".as(s"id$i")))
    }
  }

  /** Gate face over [[sequenceMatch]]: per funnel-starting user, the
    * per-stage timestamps (t_<event_type> columns), stages completed,
    * and first→last conversion seconds. */
  def sequenceFunnelFace(spark: SparkSession, dir: String,
      stages: Seq[FunnelStage]): DataFrame = {
    // the face names columns t_<event_type>; a repeated type would
    // collide (the positional matcher itself is fine with repeats —
    // a repeat-capable face would need index-suffixed names)
    require(stages.map(_.eventType).distinct.size == stages.size,
      "sequenceFunnelFace needs distinct stage event types (t_<type> columns)")
    val frames = sequenceMatch(eventsFrame(spark, dir), stages)
    val named = frames.zip(stages).zipWithIndex.map { case ((f, st), i) =>
      f.select($"user_id", col(s"t$i").as(s"t_${st.eventType}"))
    }
    val full = named.tail.foldLeft(named.head)(
      (acc, f) => acc.join(f, Seq("user_id"), "left"))
    val tCols = stages.map(st => col(s"t_${st.eventType}"))
    val stageCount = tCols.tail.foldLeft(lit(1L))(
      (acc, c) => acc + when(c.isNotNull, 1L).otherwise(0L))
    full.select(
      ($"user_id" +: tCols) ++ Seq(
        stageCount.as("stages"),
        (tCols.last - tCols.head).as("secs_to_convert")): _*)
      .orderBy($"user_id")
  }

  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    sequenceFunnelFace(spark, dir, FunnelStages)

  def qFunnel4(spark: SparkSession, dir: String): DataFrame =
    sequenceFunnelFace(spark, dir, Funnel4Stages)

  def qFunnelSteps(spark: SparkSession, dir: String): DataFrame =
    sequenceFunnelFace(spark, dir, FunnelStepStages)

  /** Funnel abandonment — the timer face of the sequence matcher
    * (reference signature pattern T1, fraud_detector.py:108-133): a
    * user who STARTED the funnel but had not completed it when the
    * event-time clock passed their stage-0 anchor + the funnel window
    * is emitted as abandoned, with the stage count they had reached BY
    * the deadline (a post-deadline click still advances the unbounded
    * stages in [[qFunnel]], but can never complete the bounded chain —
    * the deadline verdict is final, which is what makes the streaming
    * twin's timer emission ([[graft.streaming.SequenceTracker]])
    * equivalent). Scale shape: [[qFunnel]]'s frames plus one broadcast
    * 1-row max-clock aggregate. */
  def qFunnelAbandon(spark: SparkSession, dir: String): DataFrame = {
    val f = qFunnel(spark, dir)
    val anchor = eventsFrame(spark, dir).agg(max($"ts_s").as("max_ts"))
    f.crossJoin(broadcast(anchor))
      .withColumn("deadline", $"t_view" + FunnelWindowSecs)
      .filter($"t_purchase".isNull && $"max_ts" > $"deadline")
      .select($"user_id",
        (lit(1L) + when($"t_click".isNotNull && $"t_click" <= $"deadline", 1L)
          .otherwise(0L)).as("stages_reached"),
        $"t_view", $"deadline")
      .orderBy($"user_id")
  }

  /** Oracle twin of [[sequenceFunnelFace]], GENERATED from the same
    * stage list — one CTE per stage mirroring the per-user windows, so
    * the Spark matcher and the oracle can never drift on a stage's
    * predicate. */
  def sqlSequenceFunnel(stages: Seq[FunnelStage]): String = {
    require(stages.map(_.eventType).distinct.size == stages.size,
      "sqlSequenceFunnel needs distinct stage event types (t_<type> columns)")
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s0 AS (SELECT user_id, ts_s AS t0, event_id AS id0 FROM (
           |    SELECT user_id, ts_s, event_id,
           |      row_number() OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS rn
           |    FROM e WHERE event_type = '${st.eventType}') WHERE rn = 1)""".stripMargin
      else {
        val within =
          st.withinSecs.map(w => s" AND x.ts_s <= p.t0 + $w").getOrElse("") +
            st.withinPrevSecs
              .map(w => s" AND x.ts_s <= p.t${i - 1} + $w").getOrElse("")
        s"""s$i AS (SELECT user_id, t0, ts_s AS t$i, event_id AS id$i FROM (
           |    SELECT x.user_id, p.t0, x.ts_s, x.event_id,
           |      row_number() OVER (PARTITION BY x.user_id ORDER BY x.ts_s, x.event_id) AS rn
           |    FROM e x JOIN s${i - 1} p USING (user_id)
           |    WHERE x.event_type = '${st.eventType}'
           |      AND (x.ts_s > p.t${i - 1} OR (x.ts_s = p.t${i - 1} AND x.event_id > p.id${i - 1}))$within)
           |  WHERE rn = 1)""".stripMargin
      }
    }.mkString(",\n")
    val tSel = stages.zipWithIndex
      .map { case (st, i) => s"s$i.t$i AS t_${st.eventType}" }.mkString(", ")
    val n = stages.length - 1
    val stagesExpr = (1 to n)
      .map(i => s"CASE WHEN s$i.t$i IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, (epoch_ms(ts) // 1000) AS ts_s,
       |    event_type FROM events),
       |$ctes
       |SELECT s0.user_id, $tSel,
       |  (1 + $stagesExpr)::BIGINT AS stages,
       |  (s$n.t$n - s0.t0)::BIGINT AS secs_to_convert
       |FROM s0 ${(1 to n).map(i => s"LEFT JOIN s$i USING (user_id)").mkString(" ")}
       |ORDER BY s0.user_id""".stripMargin
  }

  val sqlFunnel: String = sqlSequenceFunnel(FunnelStages)
  val sqlFunnel4: String = sqlSequenceFunnel(Funnel4Stages)
  val sqlFunnelSteps: String = sqlSequenceFunnel(FunnelStepStages)

  val sqlFunnelAbandon: String =
    s"""WITH f AS ($sqlFunnel),
       |mx AS (SELECT max(epoch_ms(ts) // 1000) AS max_ts FROM events)
       |SELECT user_id,
       |  (1 + CASE WHEN t_click IS NOT NULL
       |            AND t_click <= t_view + $FunnelWindowSecs THEN 1 ELSE 0 END)::BIGINT
       |    AS stages_reached,
       |  t_view, (t_view + $FunnelWindowSecs)::BIGINT AS deadline
       |FROM f CROSS JOIN mx
       |WHERE t_purchase IS NULL AND max_ts > t_view + $FunnelWindowSecs
       |ORDER BY user_id""".stripMargin
}
