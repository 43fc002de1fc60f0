package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Similarity search over the `embeddings` table (vec_id,
 * embedding float[64], label) — driver-mandated ANN surface.
 *
 * Two paths, same contract:
 *  - brute-force cosine top-k: the exactness baseline. Query set is
 *    broadcast; the corpus streams through executors — one scan, no
 *    corpus shuffle, O(|Q|·|C|) math. Right answer, linear cost.
 *  - random-hyperplane LSH buckets: the 100 TB path. Each vector maps
 *    to a bucket id by the sign pattern of 4 fixed hyperplanes;
 *    candidates collide per-bucket (shuffle on bucket id only), then
 *    exact cosine ranks within the bucket.
 *
 * Cosine is computed with explicit left-to-right folds so the DuckDB
 * oracle (same fold) is bit-identical — see cosineCol/sqlCosine.
 */
object Similarity {
  import Relational.ColInterp

  val NumPlanes = 4
  val Dims = 64
  val TopK = 5

  /** JVM twin of Hashing.h60 (driver-side constant generation). */
  private def h60Jvm(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)

  /** Deterministic hyperplanes: component (p,d) = h60("p,d") mapped to
    * an integer in [-1000, 1000] (exact in double, exact in SQL text —
    * the same constants are embedded in the oracle SQL). */
  val planes: Seq[Seq[Double]] =
    (0 until NumPlanes).map(p => (1 to Dims).map(d => (h60Jvm(s"$p,$d") % 2001 - 1000).toDouble))

  /** Native codegen'd dot product (graft.functions.DotProduct) — the
    * strict left fold `(((0.0 + x₁y₁) + x₂y₂) + …)`, bit-identical to
    * the zip_with/aggregate formulation it replaced but inside
    * whole-stage codegen instead of interpreted lambda dispatch. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** Cosine similarity of two array<double> columns, fold-ordered. */
  def cosineCol(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Fold-ordered L2 norm — precomputed per vector so pair joins do one
    * dot product per candidate instead of three. Bit-identical to
    * [[cosineCol]]: same fold, same sqrt, same multiply. */
  def normCol(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from a shared dot fold and precomputed norms. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** LSH bucket id: bit p set iff dot(v, plane_p) > 0. */
  def bucketCol(v: Column): Column =
    (0 until NumPlanes).map { p =>
      when(dot(v, typedLit(planes(p))) > 0, 1 << p).otherwise(0)
    }.reduce(_ + _).cast("int")

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddingsSharded(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))

  // ------------------------------------------------------------------
  // Brute-force cosine top-k: queries (vec_id < 10) broadcast against
  // the full corpus.
  // ------------------------------------------------------------------
  def qKnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val corpus = vecs(spark, dir).withColumn("nv", normCol($"v"))
    val queries = corpus.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nv".as("nq"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    corpus.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosineWithNorms($"qv", $"v", $"nq", $"nv").as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  // -- DuckDB mirrors ------------------------------------------------

  /** DuckDB: strict left-fold sum over a DOUBLE list expression. */
  private def sqlFsum(l: String): String =
    s"list_reduce([0.0::DOUBLE] || ($l), (acc, x) -> acc + x)"

  /** DuckDB cosine between DOUBLE[] expressions `a` and `b`, same fold
    * order as [[cosineCol]]. */
  def sqlCosine(a: String, b: String): String = {
    val dot = sqlFsum(s"list_transform(range(1, $Dims + 1), i -> ($a)[i] * ($b)[i])")
    val na = sqlFsum(s"list_transform(($a), x -> x * x)")
    val nb = sqlFsum(s"list_transform(($b), x -> x * x)")
    s"($dot) / (sqrt($na) * sqrt($nb))"
  }

  private def sqlPlane(p: Int): String =
    // components are exact integers in [-1000, 1000]; emit them
    // locale-independently (f"%.1f" would print '-713,0' under a
    // comma-decimal default locale and break the oracle SQL)
    planes(p).map(c => c.toLong.toString + ".0").mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB LSH bucket id of DOUBLE[] expression `v`. */
  def sqlBucket(v: String): String =
    (0 until NumPlanes).map { p =>
      val dot = sqlFsum(s"list_transform(range(1, $Dims + 1), i -> ($v)[i] * (${sqlPlane(p)})[i])")
      s"(CASE WHEN ($dot) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")::INTEGER")

  val sqlKnnBruteForce: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |        ${sqlCosine("q.v", "v.v")} AS cosine
       |      FROM v q JOIN v ON q.vec_id < 10 AND v.vec_id <> q.vec_id)
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM c)
       |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------------
  // ANN via LSH buckets: shuffle on bucket id only, exact cosine
  // within bucket, top-3 per query. Recall vs brute force is asserted
  // in the ScalaTest spec; the oracle checks determinism of the
  // full pipeline.
  // ------------------------------------------------------------------
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val base = vecs(spark, dir)
      .withColumn("bucket", bucketCol($"v"))
      .withColumn("nv", normCol($"v"))
    val queries = base.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nv".as("nq"), $"bucket")
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    base.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosineWithNorms($"qv", $"v", $"nq", $"nv").as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val sqlAnnLsh: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |             ${sqlBucket("embedding::DOUBLE[]")} AS bucket
       |           FROM embeddings),
       |c AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |        ${sqlCosine("q.v", "v.v")} AS cosine
       |      FROM v q JOIN v ON q.bucket = v.bucket AND q.vec_id < 10 AND v.vec_id <> q.vec_id)
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM c)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------------
  // ANN via IVF cells: every vector is assigned to its nearest of
  // NumCells centroid vectors (argmax cosine, centroid-id tie-break);
  // a query probes its own cell only (nprobe=1). The inverted-file
  // counterpart to the hyperplane LSH path: assignment is one
  // broadcast join against the centroids (K cosines per row, codegen'd
  // dot), then the search shuffles on cell id only. Centroids here are
  // the first NumCells corpus vectors — a deterministic stand-in for
  // the k-means step (which is training, not query, work).
  // ------------------------------------------------------------------
  val NumCells = 8

  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val base = vecs(spark, dir).withColumn("nv", normCol($"v"))
    val cents = base.filter($"vec_id" < NumCells)
      .select($"vec_id".as("cent_id"), $"v".as("cv"), $"nv".as("ncv"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = base.join(broadcast(cents))
      .select($"vec_id", $"v", $"nv", $"cent_id",
        cosineWithNorms($"v", $"cv", $"nv", $"ncv").as("ccos"))
      .withColumn("rk", row_number().over(wAssign))
      .filter($"rk" === 1)
      .select($"vec_id", $"v", $"nv", $"cent_id".as("cell"))
      .persist() // the inverted file: built once, probed by the query join
    assigned.count() // eager materialization
    val queries = assigned.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nv".as("nq"), $"cell")
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    assigned.join(broadcast(queries), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosineWithNorms($"qv", $"v", $"nq", $"nv").as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val sqlAnnIvf: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (SELECT vec_id, v, cell FROM (
       |    SELECT v.vec_id, v.v, c.vec_id AS cell,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${sqlCosine("v.v", "c.v")} DESC, c.vec_id) AS rk
       |    FROM v JOIN v c ON c.vec_id < $NumCells)
       |  WHERE rk = 1),
       |c2 AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${sqlCosine("q.v", "a.v")} AS cosine
       |      FROM a q JOIN a ON q.cell = a.cell AND q.vec_id < 10 AND a.vec_id <> q.vec_id)
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM c2)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------------
  // Embedding near-dup pairs: same-bucket candidates with cosine above
  // threshold — the "near-dup by embedding" dedup operator, bucketed
  // so it scales like the MinHash LSH join.
  // ------------------------------------------------------------------
  def qEmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val base = vecs(spark, dir)
      .withColumn("bucket", bucketCol($"v"))
      .withColumn("nv", normCol($"v"))
      .persist() // bucket + norm computed once, read by both join sides
    base.count() // eager materialization
    val a = base.as("a")
    val b = base.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineWithNorms(col("a.v"), col("b.v"), col("a.nv"), col("b.nv")).as("cosine"))
      .filter($"cosine" >= 0.4)
      .orderBy($"vec_a", $"vec_b")
  }

  val sqlEmbeddingNearDup: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |             ${sqlBucket("embedding::DOUBLE[]")} AS bucket
       |           FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${sqlCosine("a.v", "b.v")} AS cosine
       |FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${sqlCosine("a.v", "b.v")} >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
}
