package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Scratch
import graft.sources.Tables

/**
 * Embedding-column vector operators: L2 normalization, per-label
 * mean-pool centroids, and centroid-cosine scoring (the outlier /
 * cluster-coherence signal a training-data pipeline runs over every
 * embedded shard).
 *
 * Scale shape: normalization is per-row fold math inside codegen (the
 * native [[graft.functions.VectorExpressions.dotProduct]] fold);
 * centroids shuffle (label, dim, value) triples with map-side partial
 * aggregation — 64 slim rows per vector, independent of corpus size —
 * and come back as one tiny broadcast frame for the scoring join.
 * Cross-engine determinism: sums are exact DECIMAL(28,12) (order-free),
 * folds are strict left-to-right (see [[Similarity.cosineCol]]).
 */
object Embeddings {
  import Relational.ColInterp

  val Dims: Int = Similarity.Dims

  private val DEC = DecimalType(18, 6)
  private def r6(c: Column): Column = c.cast(DecimalType(28, 12)).cast(DEC).cast("double")
  private val rSql = (e: String) => s"CAST(round(CAST(($e) AS DECIMAL(28,12)), 6) AS DOUBLE)"

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddingsSharded(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))

  // ------------------------------------------------------------------
  // L2 normalization: per-vector norm + the first two components of
  // the unit vector (the oracle-checkable face of the full normalize;
  // downstream ops consume normCol/cosineCol directly).
  // ------------------------------------------------------------------
  def qEmbNorm(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select($"vec_id", $"label", Similarity.normCol($"v").as("nv"), $"v")
      .select($"vec_id", $"label",
        r6($"nv").as("l2_norm"),
        r6(element_at($"v", 1) / nullif($"nv", lit(0.0))).as("u0"),
        r6(element_at($"v", 2) / nullif($"nv", lit(0.0))).as("u1"))
      .orderBy($"vec_id")

  val sqlEmbNorm: String = {
    val norm = s"sqrt(${Similarity.sqlFsum("list_transform(v, x -> x * x)")})"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, label, v, $norm AS nv FROM e)
       |SELECT vec_id, label,
       |  ${rSql("nv")} AS l2_norm,
       |  ${rSql("v[1] / NULLIF(nv, 0.0)")} AS u0,
       |  ${rSql("v[2] / NULLIF(nv, 0.0)")} AS u1
       |FROM n ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Mean-pool centroid per label. Dimension values sum as exact
  // DECIMAL(28,12) — shuffle-order independent, so the same value
  // comes out of any cluster topology — then divide as double.
  // Gate face exposes n_vecs + the first four centroid components.
  // ------------------------------------------------------------------
  /** (label, dim, cmean, n) — dim is 0-based. */
  private def centroidDims(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select($"label", posexplode($"v").as(Seq("dim", "x")))
      .groupBy($"label", $"dim")
      .agg(
        (sum($"x".cast(DecimalType(28, 12))).cast("double") / count(lit(1)))
          .as("craw"),
        count(lit(1)).as("n"))
      .select($"label", $"dim", r6($"craw").as("cmean"), $"n")

  private val sqlCentroidDims: String =
    s"""SELECT label, d AS dim,
       |  ${rSql("CAST(sum(CAST(v[d + 1] AS DECIMAL(28,12))) AS DOUBLE) / count(*)")} AS cmean,
       |  count(*) AS n
       |FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
       |CROSS JOIN range(0, $Dims) AS r(d)
       |GROUP BY label, d""".stripMargin

  def qEmbCentroid(spark: SparkSession, dir: String): DataFrame =
    centroidDims(spark, dir)
      .groupBy($"label")
      .agg(
        max($"n").cast("long").as("n_vecs"),
        max(when($"dim" === 0, $"cmean")).as("c0"),
        max(when($"dim" === 1, $"cmean")).as("c1"),
        max(when($"dim" === 2, $"cmean")).as("c2"),
        max(when($"dim" === 3, $"cmean")).as("c3"))
      .orderBy($"label")

  val sqlEmbCentroid: String =
    s"""SELECT label, max(n)::BIGINT AS n_vecs,
       |  max(CASE WHEN dim = 0 THEN cmean END) AS c0,
       |  max(CASE WHEN dim = 1 THEN cmean END) AS c1,
       |  max(CASE WHEN dim = 2 THEN cmean END) AS c2,
       |  max(CASE WHEN dim = 3 THEN cmean END) AS c3
       |FROM ($sqlCentroidDims)
       |GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------------------
  // Centroid-cosine scoring: each vector's cosine to its own label's
  // mean-pool centroid — low values flag mislabeled/outlier rows. The
  // centroid frame is |labels| rows → broadcast join; the corpus
  // streams through in one scan.
  // ------------------------------------------------------------------
  def qEmbCentroidDist(spark: SparkSession, dir: String): DataFrame = {
    val cent = centroidDims(spark, dir)
      .groupBy($"label")
      .agg(transform(
        array_sort(collect_list(struct($"dim", $"cmean"))),
        s => s.getField("cmean")).as("cv"))
    vecs(spark, dir)
      .join(broadcast(cent), "label")
      .select($"vec_id", $"label",
        r6(Similarity.cosineCol($"v", $"cv")).as("cos_centroid"))
      .orderBy($"vec_id")
  }

  val sqlEmbCentroidDist: String = {
    val cos = Similarity.sqlCosine("v", "cv")
    s"""WITH cd AS ($sqlCentroidDims),
       |cent AS (SELECT label, list(cmean ORDER BY dim) AS cv FROM cd GROUP BY label),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id, label, ${rSql(cos)} AS cos_centroid
       |FROM e JOIN cent USING (label)
       |ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Symmetric int8 quantization: per-vector absmax scale, 4× storage
  // compression with per-row reconstruction-error accounting — the
  // vector-store compression step, with the error columns that tell
  // you whether the ANN recall budget survives it. All per-row fold
  // math inside one scan (no shuffle except the presentation sort).
  // Rounding goes through the exact-decimal cast so both engines
  // round the identical double identically; error sums fold strictly
  // left-to-right, same as every other vector reduction here.
  // ------------------------------------------------------------------
  val QuantLevels = 127L

  def qEmbQuantize(spark: SparkSession, dir: String): DataFrame = {
    val amax = array_max(transform($"v", x => abs(x)))
    // the raw scale is named `_scale`, NOT `scale`: the output column
    // below aliases the ROUNDED value as `scale`, and Spark 4's
    // lateral column alias resolution would otherwise let that alias
    // shadow the raw column inside sibling select expressions —
    // quantizing against the rounded scale (observed: max_abs_err
    // drifted at the 4th significant digit vs the oracle)
    val qi = (x: Column) =>
      x.divide($"_scale").cast(DecimalType(28, 12)).cast(DecimalType(28, 0))
        .cast("long")
    val errs = transform($"v",
      x => abs(x - qi(x).cast("double") * $"_scale"))
    vecs(spark, dir)
      .withColumn("_scale", amax / QuantLevels.toDouble)
      .filter($"_scale" > 0.0) // all-zero vectors carry no information
      .select($"vec_id", $"label", r6($"_scale").as("scale"),
        qi(element_at($"v", 1)).as("q0"),
        qi(element_at($"v", 2)).as("q1"),
        r6(array_max(errs)).as("max_abs_err"),
        r6(aggregate(errs, lit(0.0), (a, x) => a + x) / size($"v"))
          .as("mean_abs_err"))
      .orderBy($"vec_id")
  }

  val sqlEmbQuantize: String = {
    val qi = (x: String) =>
      s"CAST(CAST(round(CAST(($x) / scale AS DECIMAL(28,12)), 0) AS DECIMAL(28,0)) AS BIGINT)"
    val errs = s"list_transform(v, x -> abs(x - ${qi("x")}::DOUBLE * scale))"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, label, v,
       |        list_max(list_transform(v, x -> abs(x))) / $QuantLevels.0 AS scale
       |      FROM e)
       |SELECT vec_id, label, ${rSql("scale")} AS scale,
       |  ${qi("v[1]")} AS q0, ${qi("v[2]")} AS q1,
       |  ${rSql(s"list_max($errs)")} AS max_abs_err,
       |  ${rSql(s"${Similarity.sqlFsum(errs)} / len(v)")} AS mean_abs_err
       |FROM s WHERE scale > 0.0
       |ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Product-quantization encode (Jégou et al. 2011, "Product
  // Quantization for Nearest Neighbor Search"): split each vector into
  // PqSubspaces contiguous subvectors and assign each to its nearest
  // sub-codebook centroid by squared L2 (ties to the smallest code) —
  // the 64-dim float vector compresses to PqSubspaces small codes,
  // the storage format of an IVF-PQ index. Sub-codebooks are REAL
  // per-subspace trained k-means codebooks (PqCells = 64 cells each),
  // frozen as exact 2^-20-grid constants ([[PqCodebooks.Nums]], the
  // [[IvfGateCentroids]] device) so the gate stays deterministic in
  // both engines while the quantizer is a genuine product quantizer —
  // the trained books capture ~half the vector energy where sliced
  // coarse centroids captured almost none (AnnRecallSpec pins the
  // energy-capture contract). Per-vector squared quantization error
  // (sum of the four sub-space minima) is the recall-budget number
  // that decides whether this PQ survives a deployment. Scale shape:
  // pure per-row fold math against literal codebooks inside one scan
  // — no join, no shuffle beyond the presentation sort; at 100 TB the
  // codebooks ride the closure exactly like a broadcast.
  // Cross-engine determinism: each sub-distance is the strict left
  // fold of (x−c)² terms; argmin via first-position-of-min over the
  // 64-entry distance array is tie-stable in both engines.
  // ------------------------------------------------------------------
  val PqSubspaces = 4
  val PqSubDims: Int = Dims / PqSubspaces
  val PqCells: Int = 64

  /** Per-subspace distance arrays d0..d3 (one entry per codebook cell)
    * for every vector — the shared core of the encoder (argmin per
    * array) and the ADC query tables (the array IS the lookup table).
    * Round-15 (guide §4): computed by the codegen'd
    * [[graft.functions.PqDistArray]] kernel — the previous
    * formulation built each cell as its own
    * `aggregate(zip_with(slice(v), cent))` tree, and those
    * higher-order functions are CodegenFallback, so every row paid
    * 4×64 interpreted folds with per-element lambda dispatch. The
    * kernel runs the identical strict left-to-right (x−c)² fold per
    * cell (bit-identical doubles, oracle hash unchanged). */
  private def pqDistFrame(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir).select(
      $"vec_id" +: (0 until PqSubspaces).map(m =>
        graft.functions.VectorExpressions.pqDistArray($"v", m).as(s"d$m")): _*)

  def qPqEncode(spark: SparkSession, dir: String): DataFrame = {
    val codes = (0 until PqSubspaces).map(m =>
      (array_position(col(s"d$m"), array_min(col(s"d$m"))) - 1)
        .cast("long").as(s"pq$m"))
    val sqErr = (0 until PqSubspaces).map(m => array_min(col(s"d$m")))
      .reduce(_ + _)
    pqDistFrame(spark, dir)
      .select($"vec_id" +: (codes :+ r6(sqErr).as("sq_err")): _*)
      .withColumn("pq_code",
        (0 until PqSubspaces).map(m => col(s"pq$m"))
          .reduce((a, b) => a * PqCells + b).cast("long"))
      .orderBy($"vec_id")
  }

  /** DuckDB twin of [[pqDistFrame]]: `d AS (SELECT vec_id, d0..d3 …)`
    * CTE body shared by the encode and ADC oracles. */
  private val sqlPqDistCte: String = {
    def centSql(cent: Seq[Long]): String =
      s"list_transform(${cent.mkString("[", ", ", "]")}, x -> x / 1048576.0)"
    def subDistSql(m: Int, cent: Seq[Long]): String = {
      val cv = centSql(cent)
      Similarity.sqlFsum(
        s"list_transform(range(1, ${PqSubDims + 1}), " +
          s"i -> (v[${m * PqSubDims} + i] - ($cv)[i]) * (v[${m * PqSubDims} + i] - ($cv)[i]))")
    }
    val dCols = (0 until PqSubspaces).map { m =>
      val cells = PqCodebooks.Nums(m).map(nums => subDistSql(m, nums))
      s"[${cells.mkString(", ")}] AS d$m"
    }
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT vec_id, ${dCols.mkString(",\n       |  ")} FROM e)""".stripMargin
  }

  private val sqlPqCodeCols: Seq[String] = (0 until PqSubspaces).map(m =>
    s"(list_position(d$m, list_min(d$m)) - 1)::BIGINT AS pq$m")

  /** Shared SQL snippets of the three PQ search twins — ADC distance,
    * lut relabel, and the frozen IVF centroid VALUES rows — one home,
    * like [[pqCodes]]/[[pqQueryLuts]]/[[adcCol]] on the Spark side. */
  private val sqlAdcExpr: String =
    (0 until PqSubspaces).map(m => s"lut$m[pq$m + 1]").reduce((a, b) => s"$a + $b")
  private val sqlLutCols: String =
    (0 until PqSubspaces).map(m => s"d$m AS lut$m").mkString(", ")
  private val sqlCentRows: String =
    IvfGateCentroids.Nums.zipWithIndex.map { case (nums, i) =>
      s"($i, list_transform(${nums.mkString("[", ", ", "]")}, x -> x / 1048576.0))"
    }.mkString(",\n  ")

  val sqlPqEncode: String = {
    val err = (0 until PqSubspaces).map(m => s"list_min(d$m)")
      .reduce((a, b) => s"($a + $b)")
    val packed = (0 until PqSubspaces).map(m => s"pq$m")
      .reduce((a, b) => s"($a * $PqCells + $b)")
    s"""WITH $sqlPqDistCte,
       |c AS (SELECT vec_id, ${sqlPqCodeCols.mkString(", ")},
       |        ${rSql(err)} AS sq_err
       |      FROM d)
       |SELECT vec_id, pq0, pq1, pq2, pq3,
       |  $packed::BIGINT AS pq_code, sq_err
       |FROM c ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // PQ asymmetric-distance top-k (the ADC search of Jégou et al. 2011
  // §IV): queries stay full-precision, the corpus exists ONLY as PQ
  // codes, and each pair's approximate distance is four table lookups
  // — d(q, x) ≈ Σ_m lut_m[code_m(x)], where lut_m is the query's
  // distance array to subspace m's codebook. The d0..d3 arrays
  // [[pqDistFrame]] computes ARE those lookup tables, so encoder and
  // searcher provably share one core. This is what makes PQ an index
  // rather than a compressor: the corpus side of the search never
  // touches a float vector. Scale shape: the code frame is 4 small
  // ints per vector (the 100 TB point of PQ); queries + their 4×8
  // luts broadcast; ranking is the same per-query window as every
  // top-k here. Tie-stability: equal ADC distances rank by vec_id.
  // ------------------------------------------------------------------
  val PqTopK = 3

  /** PQ code frame (4 small ints per vector) from the shared distance
    * arrays — argmin per subspace, tie-to-smallest-code. One home for
    * the construction qPqAdc / qAnnIvfPq / qPqRerank all search over
    * (mirroring how [[sqlPqCodeCols]] is shared on the SQL side). */
  private def pqCodes(dists: DataFrame): DataFrame =
    dists.select(
      $"vec_id" +: (0 until PqSubspaces).map(m =>
        (array_position(col(s"d$m"), array_min(col(s"d$m"))) - 1)
          .cast("int").as(s"pq$m")): _*)

  /** The ≤10 gate queries' per-subspace ADC lookup tables — the
    * distance arrays themselves, relabeled lut0..lut3. */
  private def pqQueryLuts(dists: DataFrame): DataFrame =
    dists.filter($"vec_id" < 10).select(
      $"vec_id".as("query_id") +:
        (0 until PqSubspaces).map(m => col(s"d$m").as(s"lut$m")): _*)

  /** ADC distance Σ_m lut_m[code_m]: four table lookups per pair, no
    * float vector on the corpus side. */
  private def adcCol: Column =
    (0 until PqSubspaces)
      .map(m => element_at(col(s"lut$m"), col(s"pq$m") + 1))
      .reduce(_ + _)

  /** IVF probe ranking over `base` (vec_id, v, nv): per-vector centroid
    * cosines ranked desc, kept to nprobe, persisted and counted —
    * rk = 1 is the cell assignment (inverted file), rk ≤ nprobe the
    * query probe lists. Shared by [[qAnnIvfPq]] and [[qPqRerank]]. */
  private def ivfRanked(spark: SparkSession, base: DataFrame): DataFrame = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val cents = Similarity.ivfGateCentroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("cent_id", "cv")
      .withColumn("ncv", Similarity.normCol($"cv"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val ranked = Scratch.persist(base.join(broadcast(cents))
      .select($"vec_id", $"cent_id",
        Similarity.cosineWithNorms($"v", $"cv", $"nv", $"ncv").as("ccos"))
      .withColumn("rk", row_number().over(wAssign))
      .filter($"rk" <= Similarity.IvfNprobe))
    ranked.count() // inverted file + probe lists, built once
    ranked
  }

  def qPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val dists = Scratch.persist(pqDistFrame(spark, dir))
    dists.count() // codes and query luts both read one materialization
    val w = Window.partitionBy($"query_id").orderBy($"adc", $"vec_id")
    pqCodes(dists).join(broadcast(pqQueryLuts(dists)), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", adcCol.as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= PqTopK)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
        r6($"adc").as("adc_dist"))
      .orderBy($"query_id", $"rank")
  }

  val sqlPqAdc: String = {
    s"""WITH $sqlPqDistCte,
       |codes AS (SELECT vec_id, ${sqlPqCodeCols.mkString(", ")} FROM d),
       |q AS (SELECT vec_id AS query_id, $sqlLutCols FROM d WHERE vec_id < 10),
       |pairs AS (
       |  SELECT query_id, c.vec_id, $sqlAdcExpr AS adc
       |  FROM codes c JOIN q ON c.vec_id <> q.query_id),
       |r AS (SELECT query_id, vec_id, adc,
       |        row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk
       |      FROM pairs)
       |SELECT query_id, rk::BIGINT AS rank, vec_id AS neighbor_id,
       |  ${rSql("adc")} AS adc_dist
       |FROM r WHERE rk <= $PqTopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // IVF-PQ ANN (the composition FAISS deploys as `IVFx,PQy` — Jégou
  // et al. 2011 §V): coarse quantizer prunes the corpus to the
  // query's probed cells (X9's frozen-centroid inverted file,
  // nprobe = 2), then ADC ranks ONLY those candidates by lookup-table
  // distance (X86) — the corpus side of the search touches no float
  // vector and no unprobed cell. Ranking fidelity on the SYNTHETIC
  // gate corpus is limited by the data, not the plan: isotropic unit
  // vectors concentrate pairwise distances, so ADC ordering there is
  // noise-dominated for any codebook (see the energy-capture contract
  // in AnnRecallSpec); on real manifold embeddings the same plan is
  // the standard recall/compression trade. This is the production shape at
  // 100 TB: cell assignment and PQ codes are index-build artifacts
  // (both gated on their own), the per-query cost is nprobe·|cell|
  // table lookups, and the only corpus-sized shuffle is the cell-id
  // candidate join. Recall dials: nprobe (cells scanned) and the
  // codebook resolution, each audited by its own gate (q_ann_ivf,
  // q_pq_encode's sq_err).
  // ------------------------------------------------------------------
  def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val base = vecs(spark, dir).withColumn("nv", Similarity.normCol($"v"))
    val ranked = ivfRanked(spark, base)
    val dists = Scratch.persist(pqDistFrame(spark, dir))
    dists.count() // codes and query luts read one materialization
    val assigned = ranked.filter($"rk" === 1).select($"vec_id", $"cent_id".as("cell"))
    val queryCells = ranked.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"cent_id".as("cell"))
    val w = Window.partitionBy($"query_id").orderBy($"adc", $"vec_id")
    assigned.join(broadcast(queryCells), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .join(pqCodes(dists), Seq("vec_id"))
      .join(broadcast(pqQueryLuts(dists)), Seq("query_id"))
      .select($"query_id", $"vec_id", adcCol.as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= PqTopK)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
        r6($"adc").as("adc_dist"))
      .orderBy($"query_id", $"rank")
  }

  val sqlAnnIvfPq: String = {
    s"""WITH $sqlPqDistCte,
       |codes AS (SELECT vec_id, ${sqlPqCodeCols.mkString(", ")} FROM d),
       |cc(cent_id, cv) AS (VALUES
       |  $sqlCentRows),
       |s AS (SELECT e.vec_id, cc.cent_id,
       |        ${Similarity.sqlCosine("e.v", "cc.cv")} AS ccos
       |      FROM e CROSS JOIN cc),
       |r AS (SELECT vec_id, cent_id,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rk
       |      FROM s),
       |a AS (SELECT vec_id, cent_id AS cell FROM r WHERE rk = 1),
       |qc AS (SELECT vec_id AS query_id, cent_id AS cell FROM r
       |       WHERE vec_id < 10 AND rk <= ${Similarity.IvfNprobe}),
       |q AS (SELECT vec_id AS query_id, $sqlLutCols FROM d WHERE vec_id < 10),
       |pairs AS (
       |  SELECT qc.query_id, a.vec_id, $sqlAdcExpr AS adc
       |  FROM qc JOIN a ON a.cell = qc.cell AND a.vec_id <> qc.query_id
       |  JOIN codes ON codes.vec_id = a.vec_id
       |  JOIN q ON q.query_id = qc.query_id),
       |rr AS (SELECT query_id, vec_id, adc,
       |        row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk
       |      FROM pairs)
       |SELECT query_id, rk::BIGINT AS rank, vec_id AS neighbor_id,
       |  ${rSql("adc")} AS adc_dist
       |FROM rr WHERE rk <= $PqTopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // Two-stage search: IVF-PQ shortlist + exact re-rank — FAISS's
  // deployed answer to quantization noise (and the fix for the ADC
  // ordering limit the isotropic gate data exposes): ADC cheaply
  // ranks the probed cells' candidates, the top PqRerankDepth
  // survive, and ONLY those fetch their full-precision vectors for an
  // exact cosine re-rank. The fat-vector read is R·|queries| rows —
  // independent of corpus size — which is the entire economics of
  // PQ at 100 TB: codes prune, floats decide. Scale shape: everything
  // up to the shortlist is [[qAnnIvfPq]]'s plan; the re-rank join is
  // id-keyed and shortlist-sized.
  // ------------------------------------------------------------------
  val PqRerankDepth = 64

  def qPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val base = Scratch.persist(
      vecs(spark, dir).withColumn("nv", Similarity.normCol($"v")))
    base.count() // assignment, shortlist, and re-rank read one store
    val ranked = ivfRanked(spark, base)
    val dists = Scratch.persist(pqDistFrame(spark, dir))
    dists.count()
    val assigned = ranked.filter($"rk" === 1).select($"vec_id", $"cent_id".as("cell"))
    val queryCells = ranked.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"cent_id".as("cell"))
    val wAdc = Window.partitionBy($"query_id").orderBy($"adc", $"vec_id")
    val shortlist = assigned.join(broadcast(queryCells), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .join(pqCodes(dists), Seq("vec_id"))
      .join(broadcast(pqQueryLuts(dists)), Seq("query_id"))
      .select($"query_id", $"vec_id", adcCol.as("adc"))
      .withColumn("ark", row_number().over(wAdc))
      .filter($"ark" <= PqRerankDepth)
      .select($"query_id", $"vec_id")
    val queries = base.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nv".as("nq"))
    val wFinal = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    shortlist
      .join(base.select($"vec_id", $"v", $"nv"), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select($"query_id", $"vec_id",
        Similarity.cosineWithNorms($"qv", $"v", $"nq", $"nv").as("cosine"))
      .withColumn("rank", row_number().over(wFinal).cast("long"))
      .filter($"rank" <= PqTopK)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"),
        r6($"cosine").as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  val sqlPqRerank: String = {
    s"""WITH $sqlPqDistCte,
       |codes AS (SELECT vec_id, ${sqlPqCodeCols.mkString(", ")} FROM d),
       |cc(cent_id, cv) AS (VALUES
       |  $sqlCentRows),
       |s AS (SELECT e.vec_id, cc.cent_id,
       |        ${Similarity.sqlCosine("e.v", "cc.cv")} AS ccos
       |      FROM e CROSS JOIN cc),
       |r AS (SELECT vec_id, cent_id,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rk
       |      FROM s),
       |a AS (SELECT vec_id, cent_id AS cell FROM r WHERE rk = 1),
       |qc AS (SELECT vec_id AS query_id, cent_id AS cell FROM r
       |       WHERE vec_id < 10 AND rk <= ${Similarity.IvfNprobe}),
       |q AS (SELECT vec_id AS query_id, $sqlLutCols FROM d WHERE vec_id < 10),
       |pairs AS (
       |  SELECT qc.query_id, a.vec_id, $sqlAdcExpr AS adc
       |  FROM qc JOIN a ON a.cell = qc.cell AND a.vec_id <> qc.query_id
       |  JOIN codes ON codes.vec_id = a.vec_id
       |  JOIN q ON q.query_id = qc.query_id),
       |sl AS (SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS ark
       |  FROM pairs) WHERE ark <= $PqRerankDepth),
       |rr AS (
       |  SELECT sl.query_id, sl.vec_id,
       |    ${Similarity.sqlCosine("eq.v", "en.v")} AS cosine
       |  FROM sl JOIN e eq ON eq.vec_id = sl.query_id
       |          JOIN e en ON en.vec_id = sl.vec_id)
       |SELECT query_id, rank, neighbor_id, ${rSql("cosine")} AS cosine FROM (
       |  SELECT query_id, vec_id AS neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id)::BIGINT AS rank
       |  FROM rr)
       |WHERE rank <= $PqTopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------------
  // Dominant principal direction (X185 — spectral analytics over the
  // embedding corpus: the direction of maximum second moment, the
  // power-iteration primitive behind PCA whitening / anisotropy audits
  // of an embedding space, cf. Mu & Viswanath ICLR 2018 "All-but-the-
  // Top"): components quantized to exact ppm integers (double multiply
  // is IEEE-identical cross-engine, both engines truncate toward
  // zero), the uncentered second-moment matrix M = (Σ q·qᵀ) div n
  // accumulated DISTRIBUTED — each row emits its d² outer-product
  // cells via one array-lambda projection, and the (i, j) aggregation
  // map-side combines to ≤ d² cells per partition, so the shuffle
  // carries O(d²) rows regardless of corpus size — then the fixed
  // 3-round power iteration runs on the DRIVER over the collected
  // d²-cell matrix (a BOUNDED model read, corpus-independent — the
  // ivfGateCentroids stance), with an integer rescale (·1000 div
  // max|w|) per round keeping every product under 2⁶³ at any corpus
  // size. All arithmetic is truncating integer division, which Spark
  // `div` ≡ Java `/` ≡ DuckDB `//` agree on exactly (verified on
  // negatives before shipping); the oracle unrolls the same rounds
  // over a recursive-free CTE chain. Output per dimension: the
  // second-moment diagonal and the direction in ppm of the max-|u|
  // component.
  //
  // Overflow posture (round-13 hardening): the distributed Σ qi·qj is
  // accumulated in DECIMAL(38,0) — per-term |qi·qj| ≤ (10⁶·max|x|)²,
  // so even at max|x| = 10 the 38-digit sum holds ~10²⁴ rows — and
  // the oracle keeps DuckDB's native HUGEINT sum, casting to BIGINT
  // only AFTER the ÷n (mij = Σ/n is bounded by the per-term max,
  // corpus-independent). The driver's 3-round iteration runs in
  // BigInt, so the w = Σ m·u accumulations and the ·1000 rescale
  // cannot wrap for ANY input magnitude (DuckDB's side is HUGEINT
  // throughout); after each rescale |u| ≤ 1000 again, so the final
  // ppm projection stays within long.
  // ------------------------------------------------------------------
  val PdRounds = 3

  def qPrincipalDirection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.newProductEncoder
    val d = Dims
    val q = expr(
      "transform(embedding, x -> cast(cast(x as double) * 1000000.0 as bigint))")
    val base = Tables.embeddingsSharded(spark, dir).select(q.as("q"))
    val cells = base.select(explode(flatten(
        transform($"q", (qi, i) =>
          transform($"q", (qj, j) =>
            struct(i.as("i"), j.as("j"), (qi * qj).as("p")))))).as("c"))
      .select($"c.i", $"c.j", $"c.p")
    val nfr = base.agg(count(lit(1)).as("n"))
    val mdf = cells.groupBy($"i", $"j")
      .agg(sum($"p".cast("decimal(38,0)")).as("s")) // wrap-proof sum (≈10²⁴-row headroom)
      .crossJoin(broadcast(nfr))
      .select($"i", $"j", expr("s div n").as("mij")) // ÷n first ⇒ long-bounded result
    // bounded d²-cell model read; the iteration is O(d²·rounds) driver
    // math over BigInt — corpus-independent and wrap-proof for any
    // input magnitude (matching the oracle's HUGEINT arithmetic)
    val m = Array.ofDim[Long](d, d)
    mdf.collect().foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    var u = Array.fill(d)(BigInt(1000))
    for (_ <- 1 to PdRounds) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => BigInt(m(i)(j)) * u(j)).sum)
      val sMax = w.map(_.abs).max
      require(sMax > 0, "degenerate all-zero second moment")
      u = w.map(x => x * 1000 / sMax) // BigInt / truncates ≡ Spark div ≡ DuckDB //
    }
    val uMax = u.map(_.abs).max
    val rows = (0 until d).map(i =>
      (i.toLong, m(i)(i), (u(i) * 1000000L / uMax).toLong))
    spark.createDataFrame(rows)
      .toDF("dim", "diag", "dir_ppm")
      .orderBy($"dim")
  }

  val sqlPrincipalDirection: String = {
    val d = Dims
    val rounds = (1 to PdRounds).map { k =>
      val prev = if (k == 1) "u0" else s"u${k - 1}"
      s""",
         |w$k AS (SELECT m.i, CAST(sum(m.mij * $prev.u) AS BIGINT) AS w
         |  FROM m JOIN $prev ON $prev.i = m.j GROUP BY m.i),
         |s$k AS (SELECT max(abs(w)) AS s FROM w$k),
         |u$k AS (SELECT i, (w * 1000) // s AS u FROM w$k CROSS JOIN s$k)""".stripMargin
    }.mkString
    s"""WITH q AS (
       |  SELECT vec_id, i,
       |    CAST(trunc(embedding[i+1]::DOUBLE * 1000000.0) AS BIGINT) AS qv
       |  FROM embeddings, range(0, $d) r(i)),
       |n AS (SELECT count(DISTINCT vec_id) AS n FROM q),
       |m AS (SELECT a.i AS i, b.i AS j,
       |    CAST(sum(a.qv * b.qv) // n.n AS BIGINT) AS mij
       |  FROM q a JOIN q b USING (vec_id) CROSS JOIN n GROUP BY a.i, b.i, n.n),
       |u0 AS (SELECT i, 1000::BIGINT AS u FROM range(0, $d) r(i))$rounds,
       |uf AS (SELECT max(abs(u)) AS s FROM u$PdRounds)
       |SELECT m.i::BIGINT AS dim, m.mij AS diag,
       |  (u$PdRounds.u * 1000000) // uf.s AS dir_ppm
       |FROM m JOIN u$PdRounds ON u$PdRounds.i = m.i CROSS JOIN uf
       |WHERE m.i = m.j ORDER BY dim""".stripMargin
  }
}
