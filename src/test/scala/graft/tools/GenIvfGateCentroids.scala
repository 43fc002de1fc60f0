package graft.tools

import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.sources.Tables

/** One-off generator for the frozen IVF gate centroids in
  * [[graft.operators.IvfGateCentroids.Nums]]: seeded k-means
  * (k = NumCells, seed 42) over the sf0.01 embeddings, each component
  * quantized to the 2^-20 grid (numerator = round(c·2^20)) so the
  * constant is EXACTLY representable in double and reconstructed
  * bit-identically by both Spark (`n / 1048576.0d`) and DuckDB
  * (`n / 1048576.0`). Run with:
  *   sbt "Test/runMain graft.tools.GenIvfGateCentroids"
  * and paste the output over the constant block.
  */
object GenIvfGateCentroids {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = graft.operators.Similarity.ivfCentroids(
      corpus, graft.operators.Similarity.NumCells)
    val rows = cents.map(_.map(c => math.round(c * (1L << 20))).mkString("Seq(", "L, ", "L)"))
    println(rows.mkString("Seq(\n    ", ",\n    ", ")"))
    spark.stop()
  }
}
