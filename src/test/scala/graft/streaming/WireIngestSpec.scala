package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.Sf0001

class WireIngestSpec extends SparkSpec {
  import spark.implicits._

  test("wire ingest: duplicate delivery collapses and a replay of the whole chain is a no-op") {
    val first = WireIngest.qWireIngest(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    // each frame was delivered twice; the store must hold each key once
    val keys = first.map(r => (r(1), r(9))) // (code, sequential_id)
    assert(keys.distinct.size == keys.size)
    // second end-to-end run (same session → same store): the append
    // must be a no-op and the read-back identical — the replays-are-
    // no-ops contract the idempotent sink exists for
    val second = WireIngest.qWireIngest(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(second == first)
  }

  test("wire ingest: validation drops exactly the malformed variants") {
    // variants 3 (non-trade type), 4 (no code), 5 (no usable timestamp)
    // must be gone; 0/1/2/6 must all survive
    val surviving = WireIngest.qWireIngest(spark, Sf0001)
      .select(($"sequential_id" % 7).as("m")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(surviving == Seq(0L, 1L, 2L, 6L))
  }
}
