package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf001
import graft.sources.Tables

/** The rollup state is an exact monoid: merging per-batch rollups in
  * any grouping or order equals the one-shot rollup bit-for-bit. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"event_type", $"day", $"n", $"sum_v".cast("string"),
      $"min_v", $"max_v").orderBy($"event_type", $"day").collect().toSeq

  test("three daily deltas fold into exactly the full-history rollup") {
    val ev = Tables.events(spark, Sf001)
      .select($"event_type", to_date($"ts").as("day"), $"value", $"user_id")
    val full = IncrementalAgg.rollup(ev, Seq("event_type", "day"), "value")

    // Split history into three arbitrary uneven batches by user hash.
    val parts = Seq(
      ev.filter(pmod($"user_id", lit(7)) < 2),
      ev.filter(pmod($"user_id", lit(7)) === 2),
      ev.filter(pmod($"user_id", lit(7)) > 2))
    assert(parts.map(_.count()).forall(_ > 0))
    val folded = parts.tail.foldLeft(
      IncrementalAgg.rollup(parts.head, Seq("event_type", "day"), "value")) {
      (state, batch) =>
        IncrementalAgg.merge(state,
          IncrementalAgg.rollup(batch, Seq("event_type", "day"), "value"))
    }
    assert(canon(folded) == canon(full))
  }

  test("merge is commutative and the derived average is exact") {
    val ev = Tables.events(spark, Sf001)
      .select($"event_type", to_date($"ts").as("day"), $"value")
    val a = IncrementalAgg.rollup(ev.filter(dayofmonth($"day") <= 15),
      Seq("event_type", "day"), "value")
    val b = IncrementalAgg.rollup(ev.filter(dayofmonth($"day") > 15),
      Seq("event_type", "day"), "value")
    assert(canon(IncrementalAgg.merge(a, b)) == canon(IncrementalAgg.merge(b, a)))
    val avg = IncrementalAgg.withAvg(IncrementalAgg.merge(a, b))
      .select($"event_type", $"day", $"avg_v")
    val direct = ev.groupBy($"event_type", $"day")
      .agg((sum($"value".cast("decimal(28,6)")).cast("decimal(28,6)") /
        count(lit(1))).cast("decimal(28,6)").cast("double").as("avg_v"))
    assert(avg.except(direct).isEmpty && direct.except(avg).isEmpty)
  }
}
