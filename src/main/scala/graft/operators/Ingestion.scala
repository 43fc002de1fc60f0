package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * The ingestion transform chain re-expressed as batch/stream-shared
 * column logic (reference: upbit_connector.py:127-210 parse/dispatch,
 * ingestion_service.py:144-337 filter→convert→route,
 * market_data.py:147-239 validation; SURVEY §2.3 P7–P9, §2.8 F1–F21).
 *
 * Scale: all four queries are single-scan, row-local expression work
 * (JSON extraction, enum mapping, coalescing) followed by at most one
 * partial-agg shuffle — the shape that saturates I/O at 100 TB. The
 * validation split computes every rule in one pass (no per-rule scans).
 */
object Ingestion {
  import Relational.ColInterp

  /** Subscribed message types (P7/P8 analog of the market filter). */
  val SubscribedTypes: Seq[String] = Seq("click", "view", "purchase", "error")

  // ------------------------------------------------------------------
  // F15 JSON parse + F19 enum map + F17/F18 coalesce + F7 epoch time +
  // P8 type dispatch — the per-message enrichment projection.
  // ------------------------------------------------------------------
  def qJsonEnrich(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter($"event_type".isin(SubscribedTypes: _*))
      .select(
        $"event_id",
        upper($"event_type").as("code"),
        when($"event_type" === "click", 1L).when($"event_type" === "view", 2L)
          .when($"event_type" === "purchase", 3L).when($"event_type" === "error", 4L)
          .otherwise(0L).as("type_code"),
        coalesce(get_json_object($"props", "$.k").cast("long"), lit(0L)).as("k"),
        unix_seconds($"ts").as("ts_s"),
        ($"value" >= 0.0).as("valid"))
      .orderBy($"event_id")

  val sqlJsonEnrich: String =
    """SELECT event_id, upper(event_type) AS code,
      |  (CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
      |        WHEN 'purchase' THEN 3 WHEN 'error' THEN 4 ELSE 0 END)::BIGINT AS type_code,
      |  coalesce(CAST(props->>'$.k' AS BIGINT), 0) AS k,
      |  epoch_ms(ts) // 1000 AS ts_s,
      |  value >= 0 AS valid
      |FROM events WHERE event_type IN ('click', 'view', 'purchase', 'error')
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------
  // P9 validation with side-output routing: every rule evaluated in one
  // scan, rows routed by first failing rule (the reference drops
  // unsubscribed codes, rejects bad payloads, and counts both paths —
  // ingestion_service.py:165-222, market_data.py:147-239).
  // ------------------------------------------------------------------
  def qValidationSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        when(!$"event_type".isin(SubscribedTypes: _*), "UNSUBSCRIBED_TYPE")
          .when($"value" < 0.0 || $"value" > 400.0, "VALUE_OUT_OF_RANGE")
          .when(get_json_object($"props", "$.k").isNull, "MISSING_PROP")
          .otherwise("VALID").as("route"),
        $"value")
      .groupBy($"route")
      .agg(count(lit(1)).as("n"), Relational.dsum($"value").as("total_value"))
      .orderBy($"route")

  val sqlValidationSplit: String =
    """SELECT CASE
      |    WHEN event_type NOT IN ('click', 'view', 'purchase', 'error') THEN 'UNSUBSCRIBED_TYPE'
      |    WHEN value < 0 OR value > 400 THEN 'VALUE_OUT_OF_RANGE'
      |    WHEN props->>'$.k' IS NULL THEN 'MISSING_PROP'
      |    ELSE 'VALID' END AS route,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Strict validation mode (reference raises on invalid messages —
    * market_data.py:147-239 `__post_init__` ValueErrors — rather than
    * dropping them): the same rules as [[qValidationSplit]], but any
    * violation fails the job with the rule name in the error. Use for
    * pipelines where silent data loss is worse than failure. */
  def strictValidated(df: DataFrame): DataFrame =
    // assert_true raises with the rule name on violation and yields
    // NULL otherwise. Filtering on the (always-NULL-on-success) result
    // makes the assertion a data dependency of the output rows, so no
    // future CollapseProject/ColumnPruning change can elide it — unlike
    // the project-then-drop encoding, which relied on the optimizer NOT
    // pruning an unused column. assert_true is nullable, so IsNull is
    // not constant-folded away.
    df.filter(
      assert_true($"event_type".isin(SubscribedTypes: _*), lit("UNSUBSCRIBED_TYPE")).isNull &&
      assert_true($"value" >= 0.0 && $"value" <= 400.0, lit("VALUE_OUT_OF_RANGE")).isNull)

  // ------------------------------------------------------------------
  // Scalar-function catalog (F1–F5, F11, F13, F21) over customer: the
  // string/format/hash surface in one deterministic projection.
  // ------------------------------------------------------------------
  def qScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        upper($"c_name").as("name_upper"),
        lower($"c_mktsegment").as("seg_lower"),
        length(trim($"c_name")).cast("long").as("name_len"),
        $"c_mktsegment".startsWith("A").as("seg_is_a"),
        concat_ws("|", $"c_mktsegment", $"c_custkey").as("tag"),
        format_string("%s#%04d", $"c_mktsegment", $"c_custkey").as("fmt"),
        least(greatest($"c_acctbal", lit(0.0)), lit(5000.0)).as("bal_clamped"),
        sha2($"c_name", 256).as("name_sha"))
      .orderBy($"c_custkey")

  val sqlScalarFuncs: String =
    """SELECT c_custkey,
      |  upper(c_name) AS name_upper,
      |  lower(c_mktsegment) AS seg_lower,
      |  length(trim(c_name))::BIGINT AS name_len,
      |  starts_with(c_mktsegment, 'A') AS seg_is_a,
      |  concat_ws('|', c_mktsegment, c_custkey) AS tag,
      |  printf('%s#%04d', c_mktsegment, c_custkey) AS fmt,
      |  least(greatest(c_acctbal, 0.0), 5000.0) AS bal_clamped,
      |  sha256(c_name) AS name_sha
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------
  // F6 URL parse/validate as column work: deterministic URLs built from
  // customer rows, decomposed with parse_url (host/path/query/param)
  // and validated with the same scheme rule as Domain.validateWsUrl
  // (reference: upbit_connector config URL validation,
  // data_ingestion/.../config.py — ws/wss scheme + non-empty host).
  // Integer-only string building so both engines format identically.
  // ------------------------------------------------------------------
  def qUrlFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select($"c_custkey", lower($"c_mktsegment").as("seg"))
      .withColumn("url",
        concat(lit("https://market.example.com/"), $"seg",
          lit("/orders?cust="), $"c_custkey", lit("&page="), $"c_custkey" % 10))
      .select(
        $"c_custkey",
        $"url",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY")).as("query"),
        parse_url($"url", lit("QUERY"), lit("cust")).as("cust_param"),
        parse_url($"url", lit("PROTOCOL")).as("scheme"),
        $"url".rlike("^(https|wss)://[^/]+/").as("is_secure"))
      .orderBy($"c_custkey")

  val sqlUrlFuncs: String =
    """SELECT c_custkey, url,
      |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
      |  regexp_extract(url, '\?([^#]*)', 1) AS query,
      |  regexp_extract(url, '[?&]cust=([^&#]*)', 1) AS cust_param,
      |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
      |  regexp_matches(url, '^(https|wss)://[^/]+/') AS is_secure
      |FROM (
      |  SELECT c_custkey,
      |    'https://market.example.com/' || lower(c_mktsegment) ||
      |    '/orders?cust=' || c_custkey || '&page=' || (c_custkey % 10) AS url
      |  FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------
  // URL canonicalize + dedup — the crawl-frontier step (RFC 3986
  // normalization + tracking-param stripping): lowercase scheme and
  // host, keep only allowlisted query params sorted by name, then
  // keep-first per canonical form. Raw URLs are synthesized from
  // customer rows in deliberately messy shapes (mixed-case scheme and
  // host, shuffled param order, utm/ref/cust noise params) and the
  // canonicalizer is GENERIC — parse_url decomposition + param
  // allowlist — not a reverse of the construction. Scale shape: one
  // scan, per-row canonicalization in codegen, one slim shuffle on
  // the canonical hash for the keep-first group.
  // ------------------------------------------------------------------
  val UrlKeepParams: Seq[String] = Seq("page")

  def qUrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.customer(spark, dir)
      .select($"c_custkey", lower($"c_mktsegment").as("seg"))
      .withColumn("url", concat(
        lit("HTTPS://Market.Example.com/"), $"seg",
        lit("/list?page="), $"c_custkey" % 10,
        when($"c_custkey" % 2 === 0,
          concat(lit("&utm_source=feed&cust="), $"c_custkey"))
          .otherwise(concat(lit("&cust="), $"c_custkey", lit("&ref=abc")))))
    val params = split(parse_url($"url", lit("QUERY")), "&")
    val kept = filter(params, p =>
      UrlKeepParams.map(k => p.startsWith(k + "=")).reduce(_ || _))
    val canon = concat(
      lower(parse_url($"url", lit("PROTOCOL"))), lit("://"),
      lower(parse_url($"url", lit("HOST"))),
      parse_url($"url", lit("PATH")),
      when(size(kept) > 0,
        concat(lit("?"), array_join(sort_array(kept), "&"))).otherwise(lit("")))
    raw.select($"c_custkey", $"url", canon.as("canon_url"))
      .groupBy($"canon_url")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct($"url").as("n_raw_forms"),
        min($"c_custkey").as("keeper"))
      .orderBy($"canon_url")
  }

  val sqlUrlDedup: String = {
    val keepPred = UrlKeepParams.map(k => s"p LIKE '$k=%'").mkString(" OR ")
    s"""WITH raw AS (
       |  SELECT c_custkey,
       |    'HTTPS://Market.Example.com/' || lower(c_mktsegment) ||
       |    '/list?page=' || (c_custkey % 10) ||
       |    CASE WHEN c_custkey % 2 = 0
       |      THEN '&utm_source=feed&cust=' || c_custkey
       |      ELSE '&cust=' || c_custkey || '&ref=abc' END AS url
       |  FROM customer),
       |parsed AS (
       |  SELECT c_custkey, url,
       |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
       |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       |    list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
       |      p -> $keepPred) AS kept
       |  FROM raw),
       |canon AS (
       |  SELECT c_custkey, url,
       |    scheme || '://' || host || path ||
       |    CASE WHEN len(kept) > 0
       |      THEN '?' || list_aggregate(list_sort(kept), 'string_agg', '&')
       |      ELSE '' END AS canon_url
       |  FROM parsed)
       |SELECT canon_url, count(*) AS n_urls,
       |  count(DISTINCT url) AS n_raw_forms, min(c_custkey) AS keeper
       |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // Corpus snapshot diff — the crawl-to-crawl delta report: given two
  // snapshots of the same id space, classify every id as added /
  // removed / changed / unchanged by CONTENT HASH and report counts
  // plus token-mass movement. The second snapshot is synthesized from
  // the first with deterministic perturbations (ids ≡ RemovedRem mod
  // RemovedMod dropped; ids ≡ ChangedRem mod ChangedMod re-crawled
  // with a revision marker prepended; a shifted-id block added), and
  // the differ is GENERIC — full outer join on doc_id comparing
  // digests — not a reverse of the construction. Scale shape: each
  // side reduces to (doc_id, digest, n_tokens) before the join, so
  // only slim triples shuffle; text never crosses the wire. The
  // output is the ≤4-row report a crawl pipeline alerts on.
  // ------------------------------------------------------------------
  val RemovedMod = 11L; val RemovedRem = 5L
  val ChangedMod = 7L; val ChangedRem = 3L
  val AddedMod = 13L; val AddedRem = 1L
  val AddedIdShift = 1000000L

  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select($"doc_id", $"text")
    val next = docs
      .filter($"doc_id" % RemovedMod =!= RemovedRem)
      .withColumn("text",
        when($"doc_id" % ChangedMod === ChangedRem,
          concat(lit("rev2 "), $"text")).otherwise($"text"))
      .unionByName(docs.filter($"doc_id" % AddedMod === AddedRem)
        .select(($"doc_id" + AddedIdShift).as("doc_id"), $"text"))
    def slim(df: DataFrame, tag: String) = df.select(
      $"doc_id",
      sha2($"text", 256).as(s"h_$tag"),
      size(split(trim(lower($"text")), "\\s+")).cast("long")
        .as(s"n_$tag"))
    slim(docs, "a").join(slim(next, "b"), Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"h_a".isNull, "added")
          .when($"h_b".isNull, "removed")
          .when($"h_a" =!= $"h_b", "changed")
          .otherwise("unchanged").as("status"),
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"))
      .groupBy($"status")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"n_b" - $"n_a").cast("long").as("token_delta"))
      .orderBy($"status")
  }

  val sqlSnapshotDiff: String =
    s"""WITH a AS (SELECT doc_id, text FROM documents),
       |b AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $ChangedMod = $ChangedRem
       |      THEN 'rev2 ' || text ELSE text END AS text
       |  FROM a WHERE doc_id % $RemovedMod != $RemovedRem
       |  UNION ALL
       |  SELECT doc_id + $AddedIdShift, text FROM a
       |  WHERE doc_id % $AddedMod = $AddedRem),
       |sa AS (SELECT doc_id, sha256(text) AS h_a,
       |         len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_a
       |       FROM a),
       |sb AS (SELECT doc_id, sha256(text) AS h_b,
       |         len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_b
       |       FROM b),
       |d AS (
       |  SELECT
       |    CASE WHEN h_a IS NULL THEN 'added'
       |         WHEN h_b IS NULL THEN 'removed'
       |         WHEN h_a != h_b THEN 'changed'
       |         ELSE 'unchanged' END AS status,
       |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
       |  FROM sa FULL OUTER JOIN sb ON sa.doc_id = sb.doc_id)
       |SELECT status, count(*)::BIGINT AS n_docs,
       |  sum(n_b - n_a)::BIGINT AS token_delta
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Merkle-style shard digests (X156): the O(|shards|) snapshot
  // comparison that makes X78's row-level diff affordable at 100 TB —
  // each 64-doc block folds to ONE commutative xor digest of
  // h60('dig:' || doc_id || ':' || text) (order-free, so partitioning
  // can't change it; membership AND content changes both flip it,
  // masking odds 2⁻⁶⁰ per shard), and two snapshots compare digest
  // lists instead of re-reading text: only shards flagged `changed`
  // proceed to the row-level X78 diff. Same synthetic next-crawl
  // construction (Removed/Changed/Added mods) so the two ops describe
  // the SAME delta at their two granularities. Shard counts ride
  // along, catching pure add/remove without relying on the digest.
  // ------------------------------------------------------------------
  val DigestShardDocs = 64L

  def qShardDigest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select($"doc_id", $"text")
    val next = docs
      .filter($"doc_id" % RemovedMod =!= RemovedRem)
      .withColumn("text",
        when($"doc_id" % ChangedMod === ChangedRem,
          concat(lit("rev2 "), $"text")).otherwise($"text"))
      .unionByName(docs.filter($"doc_id" % AddedMod === AddedRem)
        .select(($"doc_id" + AddedIdShift).as("doc_id"), $"text"))
    def dig(df: DataFrame, tag: String) = df
      .select(expr(s"doc_id div $DigestShardDocs").as("shard"),
        graft.functions.Hashing.h60(
          concat(lit("dig:"), $"doc_id", lit(":"), $"text")).as("h"))
      .groupBy($"shard")
      .agg(count(lit(1)).as(s"n_$tag"), expr("bit_xor(h)").as(s"d_$tag"))
    dig(docs, "a").join(dig(next, "b"), Seq("shard"), "full_outer")
      .select($"shard",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"),
        coalesce($"d_a", lit(0L)).as("digest_a"),
        coalesce($"d_b", lit(0L)).as("digest_b"))
      .withColumn("changed",
        when($"n_a" =!= $"n_b" || $"digest_a" =!= $"digest_b", 1).otherwise(0))
      .orderBy($"shard")
  }

  val sqlShardDigest: String = {
    val h = graft.functions.Hashing.sqlH60("'dig:' || doc_id || ':' || text")
    s"""WITH a0 AS (SELECT doc_id, text FROM documents),
       |b0 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $ChangedMod = $ChangedRem
       |      THEN 'rev2 ' || text ELSE text END AS text
       |  FROM a0 WHERE doc_id % $RemovedMod != $RemovedRem
       |  UNION ALL
       |  SELECT doc_id + $AddedIdShift, text FROM a0
       |  WHERE doc_id % $AddedMod = $AddedRem),
       |da AS (
       |  SELECT doc_id // $DigestShardDocs AS shard, count(*)::BIGINT AS n_a,
       |    bit_xor($h) AS d_a
       |  FROM a0 GROUP BY 1),
       |db AS (
       |  SELECT doc_id // $DigestShardDocs AS shard, count(*)::BIGINT AS n_b,
       |    bit_xor($h) AS d_b
       |  FROM b0 GROUP BY 1)
       |SELECT coalesce(da.shard, db.shard) AS shard,
       |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       |  coalesce(d_a, 0) AS digest_a, coalesce(d_b, 0) AS digest_b,
       |  CASE WHEN coalesce(n_a, 0) != coalesce(n_b, 0)
       |         OR coalesce(d_a, 0) != coalesce(d_b, 0)
       |       THEN 1 ELSE 0 END AS changed
       |FROM da FULL OUTER JOIN db ON da.shard = db.shard
       |ORDER BY shard""".stripMargin
  }

  // ------------------------------------------------------------------
  // Date/time catalog (F7–F10) over orders: component extraction,
  // truncation, interval arithmetic, epoch conversion.
  // ------------------------------------------------------------------
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        quarter($"o_orderdate").cast("long").as("q"),
        (weekday($"o_orderdate") + 1).cast("long").as("isodow"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        ($"o_orderdate" + expr("INTERVAL 3 DAYS")).as("ship_by"),
        // o_orderdate is TIMESTAMP_NTZ in parquet; session tz is UTC so
        // the cast is an identity relabel, matching DuckDB's epoch_ms
        unix_seconds($"o_orderdate".cast("timestamp")).as("ts_s"))
      .orderBy($"o_orderkey")

  val sqlDateFuncs: String =
    """SELECT o_orderkey,
      |  year(o_orderdate)::BIGINT AS y,
      |  month(o_orderdate)::BIGINT AS m,
      |  day(o_orderdate)::BIGINT AS d,
      |  quarter(o_orderdate)::BIGINT AS q,
      |  isodow(o_orderdate)::BIGINT AS isodow,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  o_orderdate + INTERVAL 3 DAY AS ship_by,
      |  epoch_ms(o_orderdate) // 1000 AS ts_s
      |FROM orders ORDER BY o_orderkey""".stripMargin
}
