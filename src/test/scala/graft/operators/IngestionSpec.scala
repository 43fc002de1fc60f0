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
}
