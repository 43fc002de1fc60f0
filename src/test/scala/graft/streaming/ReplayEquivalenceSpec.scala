package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/**
 * Streaming ≡ batch replay equivalence for the two remaining stateful
 * operators (fraud/windows already have theirs): the sf0.001 events
 * table pushed through `MemoryStream` in event-time-ordered
 * micro-batches must produce exactly the batch faces' rows. This is
 * the property the reference gets from replaying Kafka into the same
 * Flink job (arch doc:106,181) — and the regression the driver gate
 * cannot see, since it only runs the batch faces.
 *
 * Micro-batch boundaries are cut where the event time strictly
 * increases, so ties never straddle a boundary (the 0-second watermark
 * would otherwise admit them in a different order than the batch
 * face's global (ts, seq) sort).
 */
class ReplayEquivalenceSpec extends SparkSpec {

  /** Split time-sorted rows into ~n chunks, cutting only at strict
    * increases of the timestamp. */
  private def timeChunks[T](sorted: Seq[T], ts: T => Long, n: Int): Seq[Seq[T]] = {
    if (sorted.isEmpty) return Seq.empty
    val targets = (1 until n).map(i => sorted(sorted.length * i / n))
    val cuts = targets.map(ts).distinct.sorted
    val groups = sorted.groupBy(r => cuts.count(_ <= ts(r)))
    groups.toSeq.sortBy(_._1).map(_._2)
  }

  test("DensitySignals: MemoryStream replay of sf0.001 equals the batch face row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import DensitySignals._

    val events = Tables.events(spark, graft.SparkSpec.Sf0001)
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"value")
      .as[DsEvent]
      .collect().toSeq.sortBy(e => (e.ts_ms, e.event_id))

    val expected = qDensitySignals(spark, graft.SparkSpec.Sf0001)
      .as[Signal].collect().toSeq.sortBy(s => (s.user_id, s.event_id))

    val input = MemoryStream[DsEvent]
    val q = detectStream(input.toDS())
      .writeStream.format("memory").queryName("density_replay")
      .outputMode("append").start()
    try {
      timeChunks[DsEvent](events, _.ts_ms, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("density_replay")
        .as[Signal].collect().toSeq.sortBy(s => (s.user_id, s.event_id))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("DeclineTrend: MemoryStream replay of daily totals equals the batch composite row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import DeclineTrend._

    val totals = graft.operators.EventWindows.qWindowTrend(spark, graft.SparkSpec.Sf0001)
      .select($"event_type".as("key"), $"day_s".as("window_start_s"), $"day_total".as("total"))
      .as[WindowTotal]
      .collect().toSeq.sortBy(w => (w.window_start_s, w.key))

    val expected = graft.operators.EventWindows.qDeclineTrend(spark, graft.SparkSpec.Sf0001)
      .as[Trigger].collect().toSeq.sortBy(t => (t.event_type, t.day_s))
    assert(expected.nonEmpty) // the composite must actually fire on this data

    val input = MemoryStream[WindowTotal]
    val q = trendStream(input.toDS())
      .writeStream.format("memory").queryName("trend_replay")
      .outputMode("append").start()
    try {
      timeChunks[WindowTotal](totals, _.window_start_s, 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("trend_replay")
        .as[Trigger].collect().toSeq.sortBy(t => (t.event_type, t.day_s))
      assert(streamed == expected)
    } finally q.stop()
  }

  test("approxDistinctByWindow: streamed HLL sketches equal the batch aggregation exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, graft.SparkSpec.Sf0001)
      .select($"ts", $"event_type", $"user_id")
      .as[(java.sql.Timestamp, String, Long)]
      .collect().toSeq.sortBy(e => (e._1.getTime, e._3))

    // Batch reference: identical expressions over the full table.
    val expected = Streams.approxDistinctByWindow(
        Tables.events(spark, graft.SparkSpec.Sf0001))
      .as[(Long, String, Long, Long)].collect().toSeq.sorted
    assert(expected.nonEmpty)

    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = Streams.approxDistinctByWindow(
        input.toDF().toDF("ts", "event_type", "user_id"))
      .writeStream.format("memory").queryName("sketch_replay")
      .outputMode("complete").start()
    try {
      // HLL merge is associative and commutative (register max), so any
      // micro-batch slicing must land on the same sketch estimate.
      timeChunks[(java.sql.Timestamp, String, Long)](events, _._1.getTime, 5)
        .foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("sketch_replay")
        .as[(Long, String, Long, Long)].collect().toSeq.sorted
      assert(streamed == expected)
    } finally q.stop()
  }

  test("profileByType: streamed ingest profile equals the batch aggregation exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, graft.SparkSpec.Sf0001)
      .select($"ts", $"event_type", $"user_id", $"value")
      .as[(java.sql.Timestamp, String, Long, Double)]
      .collect().toSeq.sortBy(e => (e._1.getTime, e._3))

    // Batch reference: identical expressions over the full table. Every
    // stat is a commutative monoid (decimal sum, min/max, counts, HLL
    // register max), so any micro-batch slicing must converge on it.
    val expected = Streams.profileByType(
        Tables.events(spark, graft.SparkSpec.Sf0001))
      .as[(String, Long, Long, Double, Double, Double, Long)]
      .collect().toSeq.sorted
    assert(expected.nonEmpty)

    val input = MemoryStream[(java.sql.Timestamp, String, Long, Double)]
    val q = Streams.profileByType(
        input.toDF().toDF("ts", "event_type", "user_id", "value"))
      .writeStream.format("memory").queryName("profile_replay")
      .outputMode("complete").start()
    try {
      timeChunks[(java.sql.Timestamp, String, Long, Double)](events, _._1.getTime, 5)
        .foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("profile_replay")
        .as[(String, Long, Long, Double, Double, Double, Long)]
        .collect().toSeq.sorted
      assert(streamed == expected)
    } finally q.stop()
  }

  test("AsofJoin: MemoryStream replay of sf0.001 equals the batch as-of join row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import AsofJoin._

    val ev = Tables.events(spark, graft.SparkSpec.Sf0001)
    val ticks = ev.filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_millis($"ts").as("ts_ms"),
        when($"event_type" === "click", 0).otherwise(1).as("side"),
        $"event_id", $"value")
      .as[Tick]
      .collect().toSeq.sortBy(t => (t.ts_ms, t.side, t.event_id))

    val expected = graft.operators.Temporal.qAsofJoin(spark, graft.SparkSpec.Sf0001)
      .select($"user_id", $"ts_ms", $"event_id", $"value", $"click_ts_ms", $"click_value")
      .as[Enriched].collect().toSeq.sortBy(e => (e.user_id, e.ts_ms, e.event_id))
    assert(expected.exists(_.click_ts_ms.isDefined)) // enrichment actually fires

    val input = MemoryStream[Tick]
    val q = enrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof_replay")
      .outputMode("append").start()
    try {
      timeChunks[Tick](ticks, _.ts_ms, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("asof_replay")
        .as[Enriched].collect().toSeq.sortBy(e => (e.user_id, e.ts_ms, e.event_id))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("WireIngest: micro-batched frame delivery with cross-batch duplicates equals the batch face") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val expected = WireIngest.qWireIngest(spark, graft.SparkSpec.Sf0001)
      .collect().toSeq.map(_.toSeq)
    assert(expected.nonEmpty)

    // The batch face delivers every frame twice inside ONE batch; here
    // the duplicate of each boundary frame arrives in the NEXT
    // micro-batch, so collapsing it requires the store anti-join (the
    // cross-batch half of K3 idempotence), not just within-batch dedup.
    val singles = WireIngest.frames(spark, graft.SparkSpec.Sf0001)
      .as[(Long, String)].collect().toSeq.distinct.sortBy(identity)
    val chunks = singles.grouped((singles.length + 2) / 3).toSeq
    assert(chunks.length == 3)
    val batches = (chunks.head +:
      chunks.sliding(2).map { pair => pair.head.takeRight(7) ++ pair.last }.toSeq) :+
      chunks.last.takeRight(7) // final pure-duplicate batch: must be a no-op

    val store = java.nio.file.Files.createTempDirectory("graft_wire_replay").toString
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("ts_ms", "frame")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val trades = graft.operators.UpbitWire.parseTrades(
          batch, "frame", "Upbit", col("ts_ms") + 5)
        val decoded = Streams.tradesFromProtoRecords(Streams.tradeProtoRecords(trades))
        Streams.idempotentAppend(decoded.toDF(), Seq("code", "sequentialId"), store)
      }.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = WireIngest.readTradeStore(spark, store).collect().toSeq.map(_.toSeq)
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("IncrementalDedup: micro-batched incoming docs probed per-batch equal the one-shot probe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup

    val docs = Tables.documentsSharded(spark, graft.SparkSpec.Sf0001)
      .select($"doc_id", $"text")
    val expected = Dedup.qIncrementalDedup(spark, graft.SparkSpec.Sf0001)
      .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(expected.nonEmpty)

    // Frozen corpus index, built once — exactly what a production
    // incremental dedup holds between batches. The incoming side
    // arrives in 3 micro-batches; per-doc verdicts depend only on
    // (doc, corpus), so the union over batches must equal the
    // one-shot probe regardless of how the batch boundary falls.
    val corpusSig = Dedup.signatureFrame(
      docs.filter($"doc_id" % Dedup.IncomingMod =!= Dedup.IncomingRem)).persist()
    corpusSig.count()
    val incoming = docs.filter($"doc_id" % Dedup.IncomingMod === Dedup.IncomingRem)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        verdicts.synchronized {
          verdicts ++= Dedup.incrementalProbe(Dedup.signatureFrame(batch), corpusSig)
            .collect().toSeq.map(_.toSeq)
        }
        ()
      }.start()
    try {
      incoming.grouped((incoming.length + 2) / 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = verdicts.toSeq.sortBy(_.head.asInstanceOf[Long])
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally { q.stop(); corpusSig.unpersist() }
  }

  test("IncrementalDedup: a growing band index catches a duplicate straddling a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup

    // Production ingestion grows the index: batch N's accepted docs are
    // part of the corpus batch N+1 probes against. The frozen-corpus
    // equivalence test above can never see an incoming-vs-incoming dup;
    // this one plants exactly that — doc 3 duplicates doc 1 across the
    // batch boundary — and requires the boundary not to hide it.
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "pack my box with five dozen liquor jugs before the night falls"))
    val alpha =
      "large scale training corpora require careful deduplication before any model sees them"
    val batch1 = Seq(
      (1L, alpha),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank")) // dup of 100
    val batch2 = Seq(
      (3L, alpha), // duplicate of doc 1 — the straddling pair
      (4L, "completely unrelated text about orbital mechanics and launch windows tonight"))

    var store = Dedup.signatureFrame(corpus.toDF("doc_id", "text")).persist()
    store.count()
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        verdicts.synchronized {
          val sig = Dedup.signatureFrame(batch).persist()
          sig.count()
          verdicts ++= Dedup.incrementalProbe(sig, store).collect()
          val grown = store.unionByName(sig).persist()
          grown.count() // absorb the batch BEFORE the next probe
          store.unpersist()
          store = grown
        }
        ()
      }.start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val byId = verdicts.map(r =>
        r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(byId(1L)._1 == "new")
      assert(byId(2L) == (("dup", 100L)))
      assert(byId(3L) == (("dup", 1L)), "cross-batch duplicate must resolve to the batch-1 doc")
      assert(byId(4L)._1 == "new")
    } finally { q.stop(); store.unpersist() }
  }

  test("NoveltyCurve: bucket-ordered ingest batches against a growing seen-shingle store equal the batch curve") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Corpus

    // sf0.01: 10 ingest buckets — sf0.001 has one bucket and proves
    // nothing about incremental maintenance
    val dir = graft.SparkSpec.Sf001
    val expected = Corpus.qNoveltyCurve(spark, dir)
      .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(expected.length > 3)

    // Production analog: a persisted distinct-shingle store the ingest
    // job unions per crawl slice. One bucket per micro-batch keeps the
    // first-occurrence-owner semantics identical to the batch curve's
    // min(bucket) ownership.
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    var seen = spark.emptyDataset[String].toDF("s").persist()
    var cum = 0L

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          val e = batch.select($"doc_id",
              explode(array_distinct(graft.functions.Hashing.wordShingles(
                graft.functions.Hashing.tokens($"text"), graft.operators.Dedup.ShingleN))).as("s"))
            .withColumn("bucket", expr(s"doc_id div ${Corpus.NoveltyBucketDocs}"))
            .persist()
          val bucket = e.select(min($"bucket")).as[Long].head()
          val Seq(nDocs, nRows) = e.agg(
            countDistinct($"doc_id"), count(lit(1))).head().toSeq.map(_.asInstanceOf[Long])
          val nNew = e.select($"s").distinct()
            .join(seen, Seq("s"), "left_anti").count()
          cum += nNew
          rows += Seq(bucket, nDocs, nRows, nNew, cum)
          val grown = seen.union(e.select($"s")).distinct().persist()
          grown.count()
          seen.unpersist()
          seen = grown
          e.unpersist()
        }
        ()
      }.start()
    try {
      docs.groupBy(_._1 / Corpus.NoveltyBucketDocs).toSeq.sortBy(_._1)
        .foreach { case (_, chunk) =>
          input.addData(chunk)
          q.processAllAvailable()
        }
      val streamed = rows.toSeq.sortBy(_.head.asInstanceOf[Long])
      // batch curve columns: bucket, n_docs, n_rows, n_new, cum_distinct(, rate)
      assert(streamed.size == expected.size)
      assert(streamed == expected.map(_.take(5)))
    } finally { q.stop(); seen.unpersist() }
  }

  test("PrioritySample: a (k+1)-deep mergeable reservoir over micro-batches equals the batch sampler") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Sampling

    // sf0.01: ~25 docs per source, so the k=16 reservoir actually
    // truncates — sf0.001 keeps everything and proves nothing
    val dir = graft.SparkSpec.Sf001
    val expected = Sampling.qPrioritySample(spark, dir)
      .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(expected.nonEmpty)

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

    // Production analog: the ingest job holds ONLY the per-source
    // top-(k+1) priorities — |sources|·(k+1) rows no matter how big
    // the corpus — because the top-m of a union of partial top-m's is
    // the global top-m. Each micro-batch folds in and re-truncates;
    // earlier data is never revisited.
    val lock = new Object
    var state = Seq.empty[(Long, String, Long, Double)]

    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("doc_id", "source", "n_chars")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        lock.synchronized {
          val stateDf = state.toDF("doc_id", "source", "n_chars", "pri")
          state = Sampling.priorityReservoir(
              Sampling.priorityFrame(batch).unionByName(stateDf),
              Sampling.PriK + 1)
            .as[(Long, String, Long, Double)].collect().toSeq
        }
        ()
      }.start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = lock.synchronized {
        Sampling.priorityFace(state.toDF("doc_id", "source", "n_chars", "pri"))
          .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      }
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("SequenceTracker: MemoryStream replay — hits ≡ batch stage windows, timer abandons ≡ batch deadline face") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import SequenceTracker._
    import graft.operators.EventWindows

    val dir = graft.SparkSpec.Sf0001
    val events = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .as[SeqEvent].collect().toSeq.sortBy(e => (e.ts_s, e.event_id))
    val maxTs = events.map(_.ts_s).max

    def run(stages: Seq[EventWindows.FunnelStage],
        qname: String): Seq[(Long, String, Long, Long)] = {
      val input = MemoryStream[SeqEvent]
      val q = trackStream(stages)(input.toDS())
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try {
        timeChunks[SeqEvent](events, _.ts_s, 4).foreach { chunk =>
          input.addData(chunk)
          q.processAllAvailable()
        }
        // sentinel at the corpus max clock (matches no stage): runs one
        // more micro-batch so timers whose deadline the FINAL watermark
        // passed fire — exactly the batch face's max_ts > deadline
        // condition, no earlier and no later
        input.addData(Seq(SeqEvent(-1L, -1L, maxTs, "__none__")))
        q.processAllAvailable()
        spark.table(qname).as[SeqOut].collect().toSeq
          .map(h => (h.user_id, h.kind, h.stage, h.ts_s)).sorted
      } finally q.stop()
    }

    // ---- 3-stage instantiation: hits from q_funnel + abandons from
    // q_funnel_abandon
    def stageHits(face: org.apache.spark.sql.DataFrame,
        stages: Seq[EventWindows.FunnelStage]): Seq[(Long, String, Long, Long)] =
      face.collect().toSeq.flatMap { r =>
        val u = r.getAs[Long]("user_id")
        stages.zipWithIndex.flatMap { case (st, i) =>
          Option(r.getAs[java.lang.Long](s"t_${st.eventType}"))
            .map(t => (u, "hit", (i + 1).toLong, t.toLong))
        }
      }
    val hits3 = stageHits(EventWindows.qFunnel(spark, dir), EventWindows.FunnelStages)
    val abandons3 = EventWindows.qFunnelAbandon(spark, dir).collect().toSeq
      .map(r => (r.getAs[Long]("user_id"), "abandon",
        r.getAs[Long]("stages_reached"), r.getAs[Long]("deadline")))
    assert(hits3.nonEmpty && abandons3.nonEmpty)
    val streamed3 = run(EventWindows.FunnelStages, "seq3_replay")
    assert(streamed3 == (hits3 ++ abandons3).sorted)

    // ---- 4-stage instantiation: the SAME tracker with a different
    // stage list reproduces the 4-stage batch face's hits
    val hits4 = stageHits(EventWindows.qFunnel4(spark, dir), EventWindows.Funnel4Stages)
    assert(hits4.nonEmpty)
    val streamed4 = run(EventWindows.Funnel4Stages, "seq4_replay")
    assert(streamed4.filter(_._2 == "hit") == hits4.sorted)

    // ---- per-step-bounded instantiation: step-gap windows drive the
    // FSM and the batch windows identically
    val hitsS = stageHits(EventWindows.qFunnelSteps(spark, dir),
      EventWindows.FunnelStepStages)
    assert(hitsS.nonEmpty)
    val streamedS = run(EventWindows.FunnelStepStages, "seqs_replay")
    assert(streamedS.filter(_._2 == "hit") == hitsS.sorted)
  }

  test("native session_window stream equals the batch islands-and-gaps sessionize") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = graft.SparkSpec.Sf0001
    // batch truth (gate face): new session iff gap > 1800 s
    val batch = graft.operators.EventWindows.qSessionize(spark, dir).collect().toSeq
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_s"),
        r.getAs[Long]("session_end_s"), r.getAs[Long]("n_events"),
        r.getAs[Double]("session_value"))).sorted
    assert(batch.nonEmpty)

    val events = Tables.events(spark, dir).filter($"user_id" < 30)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"),
        $"value".cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(e => (e._3, e._2))
    val maxTs = events.map(_._3).max

    val input = MemoryStream[(Long, Long, Long, Double)]
    // gap "1801 seconds": session_window merges when gap < gapDuration,
    // the batch face splits when gap > 1800 — 1801 makes the two rules
    // coincide exactly (gap == 1800 stays one session in both)
    val agg = input.toDF().toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("eventTime", timestamp_seconds($"ts_s"))
      .withWatermark("eventTime", "0 seconds")
      .groupBy(session_window($"eventTime", "1801 seconds"), $"user_id")
      .agg(min($"ts_s").as("session_start_s"), max($"ts_s").as("session_end_s"),
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("session_value"))
      .select($"user_id", $"session_start_s", $"session_end_s",
        $"n_events", $"session_value")
    val q = agg.writeStream.format("memory").queryName("sess_replay")
      .outputMode("append").start()
    try {
      timeChunks[(Long, Long, Long, Double)](events, _._3, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      // sentinel far past every session end so the watermark closes and
      // emits all real sessions (its own session stays open, filtered out)
      input.addData(Seq((-1L, -1L, maxTs + 4000L, 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("sess_replay")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
        .filter(_._1 >= 0).sorted
      assert(streamed == batch)
    } finally q.stop()
  }

  test("PositionTracker: MemoryStream replay of sf0.001 equals the batch face row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import PositionTracker._

    val commands = commandsFromEvents(spark, graft.SparkSpec.Sf0001)
      .collect().toSeq.sortBy(c => (c.ts_ms, c.seq))

    val expected = trackBatch(commandsFromEvents(spark, graft.SparkSpec.Sf0001))
      .collect().toSeq.sortBy(e => (e.code, e.ts_ms, e.seq, e.action))

    val input = MemoryStream[Command]
    val q = trackStream(input.toDS())
      .writeStream.format("memory").queryName("position_replay")
      .outputMode("append").start()
    try {
      timeChunks[Command](commands, _.ts_ms, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("position_replay")
        .as[PositionEvent].collect().toSeq.sortBy(e => (e.code, e.ts_ms, e.seq, e.action))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("Attribution: MemoryStream replay of sf0.001 equals the batch face row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import SequenceTracker.SeqEvent
    import AttributionTracker.AttrOut

    val dir = graft.SparkSpec.Sf0001
    val events = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .as[SeqEvent].collect().toSeq.sortBy(e => (e.ts_s, e.event_id))

    val expected = graft.operators.Behavior.qAttribution(spark, dir)
      .as[AttrOut].collect().toSeq.sortBy(a => (a.user_id, a.purchase_id))
    assert(expected.nonEmpty)
    // the equivalence must cover both arms: attributed purchases and
    // click-less (NULL-credit) ones
    assert(expected.exists(_.click_id.isDefined))
    assert(expected.exists(_.click_id.isEmpty))

    val input = MemoryStream[SeqEvent]
    val q = AttributionTracker.trackStream(input.toDS())
      .writeStream.format("memory").queryName("attr_replay")
      .outputMode("append").start()
    try {
      timeChunks[SeqEvent](events, _.ts_s, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("attr_replay")
        .as[AttrOut].collect().toSeq.sortBy(a => (a.user_id, a.purchase_id))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("IntervalJoin: the watermarked stream-stream join equals the batch interval join row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = graft.SparkSpec.Sf0001
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"),
        $"value", $"event_type")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts_s", $"value")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._3)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_s", $"value")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._3)

    // batch truth: an INDEPENDENT plain inequality join (fine at sf0.001)
    val cB = clicks.toDF("user_id", "click_id", "c_ts", "click_value")
    val pB = purchases.toDF("p_user", "purchase_id", "p_ts", "purchase_value")
    val expected = cB.join(pB, $"user_id" === $"p_user" &&
        $"c_ts" >= $"p_ts" - IntervalJoin.WindowS && $"c_ts" <= $"p_ts")
      .select($"user_id", $"purchase_id", $"p_ts", $"click_id", $"c_ts",
        $"click_value")
      .collect().toSeq.map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(3).asInstanceOf[Long]))
    assert(expected.nonEmpty)

    val cIn = MemoryStream[(Long, Long, Long, Double)]
    val pIn = MemoryStream[(Long, Long, Long, Double)]
    val q = IntervalJoin.clicksBeforePurchases(
        cIn.toDF().toDF("user_id", "event_id", "ts_s", "value"),
        pIn.toDF().toDF("user_id", "event_id", "ts_s", "value"))
      .writeStream.format("memory").queryName("ij_replay")
      .outputMode("append").start()
    try {
      // time-aligned chunks: both sides advance their watermarks together
      val cutTs = purchases.map(_._3).sorted
      val cuts = Seq(cutTs(cutTs.length / 3), cutTs(2 * cutTs.length / 3), Long.MaxValue)
      var (cRest, pRest) = (clicks, purchases)
      cuts.foreach { cut =>
        val (cNow, cLater) = cRest.partition(_._3 <= cut)
        val (pNow, pLater) = pRest.partition(_._3 <= cut)
        cRest = cLater; pRest = pLater
        if (cNow.nonEmpty) cIn.addData(cNow)
        if (pNow.nonEmpty) pIn.addData(pNow)
        q.processAllAvailable()
      }
      val streamed = spark.table("ij_replay").collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
          r(3).asInstanceOf[Long]))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }

  test("IntervalJoin left-outer: unmatched purchases null-complete once the watermark proves no click can arrive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val w = IntervalJoin.WindowS
    // user 1: click then in-window purchase (matches)
    // user 2: purchase with NO click (must null-complete)
    // user 3: click OUTSIDE the window before the purchase (must null-complete)
    val clicks = Seq((1L, 10L, 1000L, 0.5), (3L, 30L, 1000L, 0.7))
    val purchases = Seq((1L, 11L, 2000L, 9.9), (2L, 21L, 2500L, 5.0),
      (3L, 31L, 1000L + w + 10L, 7.0))

    val cIn = MemoryStream[(Long, Long, Long, Double)]
    val pIn = MemoryStream[(Long, Long, Long, Double)]
    val q = IntervalJoin.purchasesWithClicks(
        cIn.toDF().toDF("user_id", "event_id", "ts_s", "value"),
        pIn.toDF().toDF("user_id", "event_id", "ts_s", "value"))
      .writeStream.format("memory").queryName("ij_outer")
      .outputMode("append").start()
    try {
      cIn.addData(clicks); pIn.addData(purchases)
      q.processAllAvailable()
      // matched row can emit eagerly; the null-completions CANNOT —
      // the watermark hasn't passed the purchases' eviction bound yet
      val early = spark.table("ij_outer").collect()
      assert(!early.exists(r => r.getLong(1) != 11L && !r.isNullAt(3)),
        "only user 1's purchase has a matching click")
      // advance both watermarks far past every purchase + interval
      val far = 1000L + 10L * w
      cIn.addData(Seq((99L, 990L, far, 0.0)))
      pIn.addData(Seq((99L, 991L, far, 0.0)))
      q.processAllAvailable()
      val rows = spark.table("ij_outer").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      // 11 matched to click 10; 21 and 31 null-completed
      assert(rows.contains((11L, 10L)))
      assert(rows.contains((21L, -1L)), "click-less purchase must null-complete")
      assert(rows.contains((31L, -1L)), "out-of-window click must not match")
      assert(!rows.contains((31L, 30L)))
    } finally q.stop()
  }

  test("Attribution/EventFlow: a cross-batch time-traveling event fails loudly, not silently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import SequenceTracker.SeqEvent

    // the in-order-delivery contract: an event arriving in a later
    // micro-batch BEHIND the last applied (ts, id) cannot be
    // re-ordered — the FSM must abort the query instead of emitting a
    // wrong attribution/transition
    def replayOutOfOrder(mk: org.apache.spark.sql.Dataset[SeqEvent] =>
        org.apache.spark.sql.Dataset[_], name: String): Unit = {
      val input = MemoryStream[SeqEvent]
      val q = mk(input.toDS()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        input.addData(Seq(SeqEvent(7L, 10L, 100L, "click")))
        q.processAllAvailable()
        input.addData(Seq(SeqEvent(7L, 11L, 50L, "purchase"))) // behind
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def rootMsg(t: Throwable): String =
          if (t.getCause == null) String.valueOf(t.getMessage)
          else String.valueOf(t.getMessage) + rootMsg(t.getCause)
        assert(rootMsg(ex).contains("out-of-order cross-batch event"))
      } finally q.stop()
    }
    replayOutOfOrder(AttributionTracker.trackStream, "attr_ooo")
    replayOutOfOrder(EventFlowTracker.trackStream, "flow_ooo")
  }

  test("EventFlow: MemoryStream replay transitions equal the batch lead() rows and matrix") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import SequenceTracker.SeqEvent
    import EventFlowTracker.Transition

    val dir = graft.SparkSpec.Sf0001
    val events = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .as[SeqEvent].collect().toSeq.sortBy(e => (e.ts_s, e.event_id))

    // batch truth at the TRANSITION granularity: the same lead() window
    // the matrix face aggregates
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val expected = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_seconds($"ts").as("ts_s"), $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .select($"user_id", $"event_type".as("from_type"), $"to_type", $"ts_s")
      .as[Transition].collect().toSeq.sortBy(t => (t.user_id, t.ts_s, t.from_type, t.to_type))
    assert(expected.nonEmpty)

    val input = MemoryStream[SeqEvent]
    val q = EventFlowTracker.trackStream(input.toDS())
      .writeStream.format("memory").queryName("flow_replay")
      .outputMode("append").start()
    try {
      timeChunks[SeqEvent](events, _.ts_s, 4).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("flow_replay")
        .as[Transition].collect().toSeq.sortBy(t => (t.user_id, t.ts_s, t.from_type, t.to_type))
      assert(streamed.size == expected.size)
      assert(streamed == expected)
      // ...and the aggregated matrix equals the gate face
      val matrix = spark.table("flow_replay")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .withColumn("p", $"n".cast("double") /
          sum($"n").over(org.apache.spark.sql.expressions.Window
            .partitionBy($"from_type")).cast("double"))
        .collect().toSeq.map(_.toSeq).sortBy(_.take(2).mkString(","))
      val gate = graft.operators.Behavior.qEventFlow(spark, dir)
        .collect().toSeq.map(_.toSeq).sortBy(_.take(2).mkString(","))
      assert(matrix == gate)
    } finally q.stop()
  }

  test("IncrementalPhash: micro-batched incoming payloads probed per-batch equal the one-shot probe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Dedup, Multimodal}

    // the X124 claim made checkable: per-doc verdicts depend only on
    // (doc, corpus index), so the probe commutes with micro-batching —
    // including when two near-dup INCOMING docs land in different
    // batches (each still resolves against the corpus alone, in both
    // the one-shot and the split run).
    val dir = graft.SparkSpec.Sf0001
    val expected = Multimodal.qIncrementalPhash(spark, dir)
      .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(expected.nonEmpty)

    val base = Multimodal.phashFrame(Multimodal.payloadTable(spark, dir)).persist()
    base.count()
    val corpus = base.filter($"doc_id" % Dedup.IncomingMod =!= Dedup.IncomingRem)
    val incoming = base.filter($"doc_id" % Dedup.IncomingMod === Dedup.IncomingRem)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

    // force a near-dup incoming PAIR to straddle the batch boundary:
    // find two incoming docs probing to the same corpus match (near
    // dups of each other through it) and split between them; fall back
    // to a plain even split if none exists
    val dupIds = expected.filter(_(1) == "dup").map(_.head.asInstanceOf[Long])
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val batches: Seq[Seq[(Long, Long)]] =
      if (dupIds.size >= 2) {
        // cut right after the FIRST dup verdict: batch 1 holds it,
        // batch 2 holds every later one — dup-status docs (near-dups of
        // each other through their shared corpus match) straddle
        val cut = dupIds.head
        Seq(incoming.filter(_._1 <= cut), incoming.filter(_._1 > cut))
      } else incoming.grouped((incoming.length + 1) / 2).toSeq
    assert(batches.size >= 2 && batches.forall(_.nonEmpty))

    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "phash")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        verdicts.synchronized {
          verdicts ++= Multimodal.phashProbe(batch, corpus).collect().toSeq.map(_.toSeq)
        }
        ()
      }.start()
    try {
      batches.foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      val streamed = verdicts.toSeq.sortBy(_.head.asInstanceOf[Long])
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally { q.stop(); base.unpersist() }
  }

  test("IncrementalSemdedup: incoming batches probed separately equal the one-shot probe") {
    import spark.implicits._
    import graft.operators.{Dedup, Similarity}

    // the embedding-pillar probe commutes with micro-batching: cell
    // assignment is per-row against frozen centroid literals and the
    // verdict depends only on (vec, corpus)
    val dir = graft.SparkSpec.Sf0001
    val expected = Similarity.qIncrementalSemdedup(spark, dir)
      .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(expected.nonEmpty)
    assert(expected.exists(_(3) == "dup") && expected.exists(_(3) == "new"))

    val assigned = Similarity.assignedFrame(spark, dir)
    val corpus = assigned.filter($"vec_id" % Dedup.IncomingMod =!= Dedup.IncomingRem)
    val inc = assigned.filter($"vec_id" % Dedup.IncomingMod === Dedup.IncomingRem)
    val ids = inc.select($"vec_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val streamed = (Similarity.semdedupProbe(inc.filter($"vec_id" <= cut), corpus)
        .collect().toSeq ++
      Similarity.semdedupProbe(inc.filter($"vec_id" > cut), corpus)
        .collect().toSeq)
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed == expected)
  }

  test("IncrementalClusters: merging the incoming docs in 3 batches equals the from-scratch closure") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Clustering, Dedup}

    // the X125 invariance: a persisted label store maintained batch by
    // batch (absorbing each batch's signatures into the index) ends at
    // EXACTLY the labels of re-clustering the world from scratch —
    // regardless of how the incoming stream is cut.
    val dir = graft.SparkSpec.Sf0001
    val expected = Clustering.dupLabels(spark, dir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)

    val docs = Tables.documentsSharded(spark, dir).select($"doc_id", $"text")
    // the PRODUCTION wiring — the tested path IS the shipped path
    val lm = new LabelMaintenance(
      docs.filter($"doc_id" % Dedup.IncomingMod =!= Dedup.IncomingRem))
    val incoming = docs.filter($"doc_id" % Dedup.IncomingMod === Dedup.IncomingRem)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(lm.sink).start()
    try {
      incoming.grouped((incoming.length + 2) / 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val merged = lm.labels.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(merged == expected)
    } finally { q.stop(); lm.close() }
  }

  test("IncrementalClusters: a bridge doc merges two clusters; untouched clusters keep their labels") {
    import spark.implicits._
    import graft.operators.Clustering

    // unit face of the bounded-relabel contract: one new doc bridging
    // two existing components relabels exactly those components' rows;
    // a third component never enters the contracted graph.
    val store = Seq((100L, 100L), (101L, 100L), (102L, 102L), (103L, 102L),
      (200L, 200L), (201L, 200L)).toDF("id", "label")
    val edges = Seq((5L, 101L), (5L, 103L)).toDF("a", "b")
    val merged = Clustering.mergeEdgesIntoLabels(edges, store)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(merged == Seq((5L, 5L), (100L, 5L), (101L, 5L), (102L, 5L),
      (103L, 5L), (200L, 200L), (201L, 200L)))
  }

  test("RetractDoc: removing the only bridge dissolves its cluster; other components untouched") {
    import spark.implicits._
    import graft.operators.Clustering

    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (200L, 200L), (201L, 200L))
      .toDF("id", "label")
    // component {1,2,3} was held together solely by edges (1,2),(1,3):
    // retracting doc 1 leaves survivors 2 and 3 with no pair — the
    // cluster dissolves entirely (both become singletons and drop out)
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val dissolved = Clustering.retractFromLabels(labels, 1L, noPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(dissolved == Seq((200L, 200L), (201L, 200L)))
    // ...while a surviving pair re-closes the remainder under its new
    // min representative
    val pair = Seq((2L, 3L)).toDF("a", "b")
    val relabeled = Clustering.retractFromLabels(labels, 1L, pair)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(relabeled == Seq((2L, 2L), (3L, 2L), (200L, 200L), (201L, 200L)))
  }

  test("IncrementalClusters: cross-batch incoming near-dups and a relabeling join resolve like from-scratch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{Clustering, Dedup}

    // plants the cases the sf-corpus split can't guarantee: an incoming
    // doc duplicating an EARLIER BATCH's doc (3 ≡ 1 across the
    // boundary), incoming docs joining existing clusters and becoming
    // their new min labels (2 and 4), and a doc (1) that is a singleton
    // until its duplicate arrives.
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "pack my box with five dozen liquor jugs before the night falls"
    val tC = "large scale training corpora require careful deduplication before any model sees them"
    val corpus = Seq((100L, tA), (101L, tA), (102L, tB), (103L, tB))
    val batch1 = Seq((1L, tC), (2L, tB))
    val batch2 = Seq((3L, tC), (4L, tA))

    val lm = new LabelMaintenance(corpus.toDF("doc_id", "text"))
    assert(lm.labels.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted ==
      Seq((100L, 100L), (101L, 100L), (102L, 102L), (103L, 102L)))

    Seq(batch1, batch2).foreach(b => lm.absorb(b.toDF("doc_id", "text")))
    val merged = lm.labels.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted
    // from-scratch over all 8 docs: {4,100,101}→4, {2,102,103}→2, {1,3}→1
    assert(merged == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 4L),
      (100L, 4L), (101L, 4L), (102L, 2L), (103L, 2L)))
    lm.close()
  }

  test("LabelMaintenance: insert batches interleaved with a retraction equal from-scratch on the survivors") {
    import spark.implicits._

    // the X128 production path: takedown driven THROUGH the streaming
    // store pair, between absorbs. Retracting 101 mid-stream must leave
    // the maintained stores indistinguishable from a pipeline that
    // never saw doc 101 at all.
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "pack my box with five dozen liquor jugs before the night falls"
    val tC = "large scale training corpora require careful deduplication before any model sees them"
    val corpus = Seq((100L, tA), (101L, tA), (102L, tB), (103L, tB))
    val batch1 = Seq((1L, tC), (2L, tB))
    val batch2 = Seq((3L, tC), (4L, tA))

    val lm = new LabelMaintenance(corpus.toDF("doc_id", "text"))
    lm.absorb(batch1.toDF("doc_id", "text"))
    // retraction dissolves {100, 101} (survivor 100 has no pair left);
    // 100 must still re-cluster when its duplicate 4 arrives in batch2,
    // proving the retraction trimmed LABELS but kept 100's signatures
    lm.retract(101L)
    lm.absorb(batch2.toDF("doc_id", "text"))
    val streamed = lm.labels.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sorted

    // from-scratch on the SURVIVING doc set, same production class
    val lm2 = new LabelMaintenance(
      (corpus.filterNot(_._1 == 101L) ++ batch1 ++ batch2).toDF("doc_id", "text"))
    val scratch = lm2.labels.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(streamed == scratch)
    assert(streamed == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 4L),
      (100L, 4L), (102L, 2L), (103L, 2L)))
    // retracting an unclustered doc is a signature-only trim: labels
    // unchanged, and re-adding an exact dup of a REMAINING doc still
    // works afterwards
    lm.retract(999L)
    assert(lm.labels.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sorted == streamed)
    lm.close(); lm2.close()
  }

  test("RetractModalDoc: takedown trims every fingerprint index and re-closes only the affected component") {
    import graft.operators.{Clustering, Multimodal}
    import org.apache.spark.sql.functions.{col, min => fmin}

    val st = Multimodal.incModalStore(spark, graft.SparkSpec.Sf0001)
    // retract the representative of the first cross-modal cluster —
    // deterministic, and as the component's min id it forces at least
    // a relabel, a split whenever it was the bridge
    val d = st.corpusLabels.agg(fmin(col("id"))).head.getLong(0)
    val out = Multimodal.retractModalDoc(st, d)

    // nothing probeable: both fingerprint indexes and the pair store
    // have forgotten the doc
    assert(out.ph.filter(col("doc_id") === d).isEmpty)
    assert(out.fr.filter(col("doc_id") === d).isEmpty)
    assert(out.aph.filter(col("doc_id") === d).isEmpty)
    assert(out.corpusTagged
      .filter(col("doc_a") === d || col("doc_b") === d).isEmpty)

    // the bounded component splice equals the from-scratch closure over
    // the survivor pair set — removal is indistinguishable from the doc
    // never having existed (the X128 property, on multimodal evidence)
    val scratch = Clustering.connectedComponents(
      st.corpusTagged.filter(col("doc_a") =!= d && col("doc_b") =!= d)
        .select(col("doc_a").as("a"), col("doc_b").as("b")).distinct(),
      maxRounds = 64)
    val got = out.corpusLabels.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = scratch.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got == want)
    assert(!got.exists(_._1 == d))

    // untouched components keep their labels bit-for-bit
    val before = st.corpusLabels.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dLabel = before(d)
    got.filter { case (_, l) => l != dLabel }.foreach { case (id, l) =>
      if (before(id) != dLabel) assert(before(id) == l)
    }

    // the memoized shared store is untouched by the retraction view
    assert(st.corpusLabels.filter(col("id") === d).count() == 1)
    scratch.unpersist()
    Clustering.releaseMergeClosures()
  }

  test("SpoofingDetector: MemoryStream replay of sf0.001 book frames equals batch face and gate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import SpoofingDetector._

    val books = bookFrames(spark, graft.SparkSpec.Sf0001)
      .collect().toSeq.sortBy(b => (b.ts_ms, b.code))
    // the oracle's spacing contract: consecutive books of one market
    // are always further apart than the timer, so every armed level is
    // adjudicated at the market's very next book
    books.groupBy(_.code).foreach { case (_, bs) =>
      bs.map(_.ts_ms).sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b - a > TimerMs)
        case _ =>
      }
    }

    val batch = detectBatch(spark.createDataset(books)).collect().toSeq
      .sortBy(a => (a.code, a.armed_at_ms, a.price))
    assert(batch.nonEmpty)

    val input = MemoryStream[Book]
    val q = detectStream(input.toDS())
      .writeStream.format("memory").queryName("spoof_replay")
      .outputMode("append").start()
    try {
      timeChunks[Book](books, _.ts_ms, 5).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("spoof_replay").as[SpoofAlert]
        .collect().toSeq.sortBy(a => (a.code, a.armed_at_ms, a.price))
      assert(streamed == batch)
    } finally q.stop()

    // and the registered gate is exactly the batch face's rows with
    // the level/size columns cast to the oracle's integer types
    val gate = qSpoofing(spark, graft.SparkSpec.Sf0001).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(gate == batch.map(a =>
      (a.code, a.price.toLong, a.registered_size.toLong, a.armed_at_ms, a.fired_at_ms)))
  }

  test("VectorSink: streamed vector ingest equals the one-shot build; redelivery no-ops; post-ingest probe stays pruned") {
    import graft.operators.Similarity
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vector_sink").toString
    val base = s"$dir/ivf"
    // pre-ingest state: the corpus-slice artifact X165 ingests against
    Similarity.buildSliceArtifact(spark, graft.SparkSpec.Sf0001, base)
    val incoming = Similarity.vecs(spark, graft.SparkSpec.Sf0001)
      .filter(col("vec_id") % 10 === 7)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(incoming.nonEmpty)
    val vsink = new VectorSink(base)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "v").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(vsink.sink).start()
    try {
      val chunks = incoming.grouped(incoming.size / 3 + 1).toSeq
      chunks.zipWithIndex.foreach { case (c, i) =>
        input.addData(c); q.processAllAvailable()
        if (i == 1) { input.addData(c); q.processAllAvailable() } // redelivery
      }
    } finally q.stop()
    // exactly-once: every incoming vector indexed exactly once
    val inv = spark.read.parquet(s"$base/inverted")
    assert(inv.groupBy(col("vec_id")).count().filter(col("count") =!= 1).isEmpty)
    // streamed ≡ one-shot: the probe serves identical rows from the
    // stream-ingested store and the batch-appended X165 artifact
    val probeDf = Similarity.probeArtifact(spark, base)
    val streamed = probeDf.collect().toSeq
    val oneShot = Similarity.probeArtifact(spark,
      Similarity.ivfArtifactInc(spark, graft.SparkSpec.Sf0001)).collect().toSeq
    assert(streamed == oneShot,
      "stream-ingested and one-shot-built artifacts must serve identical probes")
    // and the post-ingest probe still partition-prunes the inverted scan
    val plan = probeDf.queryExecution.executedPlan.toString
    val invScan = plan.linesIterator
      .filter(l => l.contains("inverted") && l.contains("PartitionFilters"))
      .mkString("\n")
    assert(invScan.contains("PartitionFilters: [cell") && invScan.contains(" IN ("),
      "post-ingest probe must keep the literal cell partition filter:\n" + plan)
  }

  test("FeatureMaintenance: streamed per-batch store maintenance equals the batch materialization at every cut") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Behavior

    val events = Behavior.featureEvents(spark, graft.SparkSpec.Sf0001)
      .as[(Long, Long, String, Long, Long)]
      .collect().toSeq.sortBy(e => (e._4, e._2)) // (ts_s, event_id) order
    val base = java.nio.file.Files.createTempDirectory("feat_store").toString + "/store"
    val maint = new FeatureMaintenance(base)
    val input = MemoryStream[(Long, Long, String, Long, Long)]
    val q = input.toDF()
      .toDF("user_id", "event_id", "event_type", "ts_s", "cents")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("feat_ckpt").toString)
      .foreachBatch(maint.sink).start()
    val chunks = timeChunks[(Long, Long, String, Long, Long)](events, _._4, 4)
    try {
      var seen = Seq.empty[(Long, Long, String, Long, Long)]
      chunks.foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
        seen ++= chunk
        // online store ≡ offline materialization over the SAME prefix —
        // the feature-consistency contract, checked at every cut, not
        // just the end (sessions crossing the cut are the hard part)
        val online = maint.read(spark).collect().toSeq.map(_.toSeq)
        val offline = Behavior.featureFrame(
          seen.toDF("user_id", "event_id", "event_type", "ts_s", "cents"))
          .collect().toSeq.map(_.toSeq)
        assert(online == offline,
          s"online store diverged from offline batch at ${seen.size} events")
      }
      // the final store equals the gate itself
      assert(maint.read(spark).collect().toSeq.map(_.toSeq) ==
        Behavior.qFeatureStore(spark, graft.SparkSpec.Sf0001)
          .collect().toSeq.map(_.toSeq))
      // redelivery of the last chunk is a zero-shard no-op
      assert(maint.apply(chunks.last
        .toDF("user_id", "event_id", "event_type", "ts_s", "cents")) == 0L)
    } finally q.stop()
  }
}
