package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExpressions.dotProduct

class VectorExpressionsSpec extends SparkSpec {

  test("DotProduct matches a strict left-fold JVM computation exactly") {
    import spark.implicits._
    val a = Seq(0.1, -2.5, 3.75, 1e-9, 4.0)
    val b = Seq(1.5, 0.25, -1.125, 2e9, 0.5)
    val got = Seq((a, b)).toDF("a", "b")
      .select(dotProduct($"a", $"b")).head().getDouble(0)
    var expected = 0.0
    a.indices.foreach(i => expected += a(i) * b(i))
    assert(got == expected) // bit-exact, not approximate
  }

  test("DotProduct agrees with the interpreted zip_with/aggregate fold it replaced") {
    import spark.implicits._
    val df = graft.sources.Tables.embeddings(spark, graft.SparkSpec.Sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .limit(50)
    val folded = aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(dotProduct($"v", $"v").as("native"), folded.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // identical fold order
  }

  test("dot_product is registered as a SQL function via GraftExtensions") {
    val got = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .head().getDouble(0)
    assert(got == 32.0)
  }

  test("DotProduct stays inside whole-stage codegen") {
    import spark.implicits._
    // parquet-backed plan (a local relation folds to LocalTableScan)
    val plan = graft.sources.Tables.embeddings(spark, graft.SparkSpec.Sf0001)
      .select($"embedding".cast("array<double>").as("v"))
      .select(dotProduct($"v", $"v"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the projection
    // computing dot_product must carry it
    assert(plan.linesIterator.exists(l => l.contains("dot_product") && l.trim.startsWith("*(")))
  }

  test("null inputs yield null") {
    import spark.implicits._
    val got = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(dotProduct($"a", $"b")).head()
    assert(got.isNullAt(0))
  }
}
