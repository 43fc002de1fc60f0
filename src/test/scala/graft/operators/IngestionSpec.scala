package graft.operators

import graft.SparkSpec

class IngestionSpec extends SparkSpec {

  test("strict validation passes clean rows through unchanged") {
    import spark.implicits._
    val clean = Seq((1L, "click", 10.0), (2L, "purchase", 399.0))
      .toDF("event_id", "event_type", "value")
    val out = Ingestion.strictValidated(clean).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("strict validation fails the job on an unsubscribed type") {
    import spark.implicits._
    val bad = Seq((1L, "signup", 10.0)).toDF("event_id", "event_type", "value")
    val e = intercept[Exception](Ingestion.strictValidated(bad).collect())
    assert(e.getMessage.contains("UNSUBSCRIBED_TYPE"))
  }

  test("strict validation fails the job on an out-of-range value") {
    import spark.implicits._
    val bad = Seq((1L, "click", 1e6)).toDF("event_id", "event_type", "value")
    val e = intercept[Exception](Ingestion.strictValidated(bad).collect())
    assert(e.getMessage.contains("VALUE_OUT_OF_RANGE"))
  }

  test("shard digest: changed flags are exactly the shards the synthetic delta touches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Ingestion.qShardDigest(spark, SparkSpec.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    // derive the expected changed-shard set straight from the id rules
    val ids = graft.sources.Tables.documents(spark, SparkSpec.Sf0001)
      .select($"doc_id").collect().map(_.getLong(0))
    val touched = ids.filter(id =>
        id % Ingestion.RemovedMod == Ingestion.RemovedRem ||
        id % Ingestion.ChangedMod == Ingestion.ChangedRem)
      .map(_ / Ingestion.DigestShardDocs).toSet ++
      ids.filter(_ % Ingestion.AddedMod == Ingestion.AddedRem)
        .map(id => (id + Ingestion.AddedIdShift) / Ingestion.DigestShardDocs)
    rows.foreach { case (shard, changed) =>
      assert((changed == 1) == touched.contains(shard),
        s"shard $shard flag mismatch")
    }
    // untouched shards agree on BOTH digest and count (the cheap-skip set)
    val full = Ingestion.qShardDigest(spark, SparkSpec.Sf0001)
      .filter($"changed" === 0)
      .filter($"digest_a" =!= $"digest_b" || $"n_a" =!= $"n_b")
    assert(full.isEmpty)
  }
}
