package graft.operators

import graft.SparkSpec
import graft.SparkSpec.Sf0001

class MultimodalSpec extends SparkSpec {

  test("payload table: binary payload round-trips the text, metadata is consistent") {
    import spark.implicits._
    val pay = Multimodal.payloadTable(spark, Sf0001)
    val row = pay.orderBy($"doc_id").head()
    val payload = row.getAs[Array[Byte]]("payload")
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == payload.length.toLong)
    val original = graft.sources.Tables.documents(spark, Sf0001)
      .orderBy($"doc_id").head().getAs[String]("text")
    assert(new String(payload, "UTF-8") == original)
  }

  test("mapPartitions decode and expression face agree (sha + features)") {
    import spark.implicits._
    val viaRdd = Multimodal.decodeFeatures(Multimodal.payloadTable(spark, Sf0001))
      .orderBy($"doc_id").collect()
    val viaExpr = Multimodal.qMultimodalFeatures(spark, Sf0001).collect()
    assert(viaRdd.length == viaExpr.length && viaRdd.nonEmpty)
    viaRdd.zip(viaExpr).foreach { case (r, e) =>
      assert(r.getAs[Long]("doc_id") == e.getAs[Long]("doc_id"))
      assert(r.getAs[String]("content_sha") == e.getAs[String]("content_sha"))
      val fs = r.getAs[scala.collection.Seq[Double]]("features")
      assert(fs.size == Multimodal.FeatureDims)
      (0 until Multimodal.FeatureDims).foreach { d =>
        assert(math.abs(fs(d) - e.getAs[Double](s"f$d")) < 1e-12)
      }
    }
  }

  test("stubDecode: deterministic, dimension-correct, in [0,1)") {
    val f1 = Multimodal.stubDecode("hello".getBytes("UTF-8"))
    val f2 = Multimodal.stubDecode("hello".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.FeatureDims)
    assert(f1.forall(v => v >= 0.0 && v < 1.0))
  }
}
