package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.{Sf0001, Sf001}

/** Sketch contract: bounded error vs the exact references, stable
  * across partitionings (merge-associativity is what makes the sketch
  * the 100 TB path), and a fixed-memory partial-aggregation plan. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("error-bound booleans hold at both SFs") {
    Seq(Sf0001, Sf001).foreach { sf =>
      val out = Sketches.qSketchStats(spark, sf)
      assert(out.filter(!$"hll_ok" || !$"p50_ok" || !$"p99_ok").isEmpty, s"at $sf")
      assert(out.count() > 0)
    }
  }

  test("sketch results are identical under re-partitioning (merge associativity)") {
    val ev = graft.sources.Tables.events(spark, Sf0001)
      .select($"event_type", $"user_id")
    def hll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", Sketches.HllRsd).as("c"))
        .orderBy($"event_type").as[(String, Long)].collect().toSeq
    assert(hll(ev.repartition(1)) == hll(ev.repartition(17, $"user_id")))
  }

  test("sketch aggregation plans with map-side partials (fixed memory per partition)") {
    val ev = graft.sources.Tables.events(spark, Sf0001).select($"event_type", $"user_id")
    val plan = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", Sketches.HllRsd))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"))
  }
}
