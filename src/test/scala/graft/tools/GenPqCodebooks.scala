package graft.tools

import org.apache.spark.sql.functions.{col, slice}

import graft.GraftSession
import graft.operators.Embeddings
import graft.sources.Tables

/** One-off generator for the frozen PQ sub-codebooks in
  * [[graft.operators.PqCodebooks.Nums]]: per subspace m, seeded
  * k-means (k = Embeddings.PqCells, seed 42) over the sf0.01
  * embeddings RESTRICTED to dims [m·PqSubDims, (m+1)·PqSubDims) —
  * i.e. real trained product-quantizer codebooks, not slices of the
  * coarse IVF centroids. Each component is quantized to the 2^-20
  * grid (numerator = round(c·2^20)) so the constant is EXACTLY
  * representable in double and reconstructed bit-identically by both
  * Spark (`n / 1048576.0d`) and DuckDB (`n / 1048576.0`). Run with:
  *   sbt "Test/runMain graft.tools.GenPqCodebooks"
  * and paste the output over the constant block.
  */
object GenPqCodebooks {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("full"))
    val books = (0 until Embeddings.PqSubspaces).map { m =>
      val sub = base.select(col("vec_id"),
        slice(col("full"), m * Embeddings.PqSubDims + 1, Embeddings.PqSubDims).as("v"))
      graft.operators.Similarity.ivfCentroids(sub, Embeddings.PqCells)
        .map(_.map(c => math.round(c * (1L << 20))))
    }
    val out = books.map { cells =>
      cells.map(_.mkString("Seq(", "L, ", "L)"))
        .mkString("Seq( // subspace\n      ", ",\n      ", ")")
    }.mkString("Seq(\n    ", ",\n    ", ")")
    println(out)
    spark.stop()
  }
}
