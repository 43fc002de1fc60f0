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

  test("phash60 kernel matches an independent histogram-gradient reference") {
    import spark.implicits._
    // twin implementation written from the spec, not from the kernel
    def ref(s: String): Long = {
      val counts = new Array[Long](61)
      val cps = s.codePoints().toArray
      (0 until cps.length - 1).foreach(i =>
        counts((cps(i) * 131 + cps(i + 1)) % 61) += 1)
      (0 until 60).map(j => if (counts(j) > counts(j + 1)) 1L << j else 0L).sum
    }
    val rows = graft.sources.Tables.documents(spark, Sf0001).limit(20)
      .select($"text",
        graft.functions.TextKernelFunctions.phash60($"text").as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
    // degenerate inputs: empty and single-char payloads have no bigrams
    val edge = Seq("", "x").toDF("text")
      .select(graft.functions.TextKernelFunctions.phash60($"text")).collect()
    assert(edge.forall(_.getLong(0) == 0L))
  }

  test("image near-dup pairs: bucketed join ≡ exact all-pairs (pigeonhole recall)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bucketed = Multimodal.qImageNeardupPairs(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    val base = graft.sources.Tables.documents(spark, Sf0001)
      .select($"doc_id", graft.functions.TextKernelFunctions.phash60($"text").as("h"))
    val exact = base.as("a")
      .join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long"))
      .collect()
      .filter(_.getLong(2) <= 3)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == exact)
  }

  test("incremental modal merge coincides with the from-scratch verdict on the gate corpus") {
    // the monotone merge-time semantics only diverge from from-scratch
    // when a frame crosses the boilerplate cap between the corpus-only
    // and full indices; the gate corpora plant no such frame, so the
    // merge must reproduce q_modal_dedup EXACTLY — cluster ids, keeper
    // election, and all three modality-incidence flags. (The synthetic
    // cap-crossing test below documents the deliberate divergence.)
    val inc = Multimodal.qIncrementalModal(spark, Sf0001)
      .drop("origin").collect().map(_.toSeq).toSeq
    val scratch = Multimodal.qModalDedup(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty)
    assert(inc == scratch)
  }

  test("modal maintenance composes across batches when no frame crosses the cap") {
    import spark.implicits._
    // pair-level twin of the X125 multi-batch invariance for the modal
    // store: grow (phash, frame) indices batch by batch, merge each
    // batch's touching pairs, and land exactly on the from-scratch
    // closure over the union — valid whenever no frame crosses the
    // boilerplate cap between merges (the coincidence regime pinned
    // above; the kernels themselves are pinned by the gate oracles).
    def pairs(ph: org.apache.spark.sql.DataFrame, phAll: org.apache.spark.sql.DataFrame,
        fr: org.apache.spark.sql.DataFrame, frAll: org.apache.spark.sql.DataFrame) =
      Multimodal.phashPairsTouching(ph, phAll)
        .unionByName(Multimodal.videoPairsTouching(fr, frAll))
        .select($"doc_a".as("a"), $"doc_b".as("b")).distinct()

    // corpus: 100~101 are phash near-dups; 102~103 share frames {1,2}
    var phStore = Seq((100L, 5L), (101L, 5L), (102L, 900L), (103L, 800L))
      .toDF("doc_id", "phash")
    var frStore = Seq((102L, 1L), (102L, 2L), (103L, 1L), (103L, 2L),
      (100L, 7L), (101L, 8L)).toDF("doc_id", "fhash")
    var labels = Clustering.connectedComponents(
      pairs(phStore, phStore.limit(0), frStore, frStore))
    assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ==
      Seq((100L, 100L), (101L, 100L), (102L, 102L), (103L, 102L)))

    // batch 1: doc 1 is a phash dup of the {100,101} family
    val ph1 = Seq((1L, 5L)).toDF("doc_id", "phash")
    val fr1 = Seq((1L, 9L)).toDF("doc_id", "fhash")
    labels = Clustering.mergeEdgesIntoLabels(
      pairs(ph1, phStore, fr1, frStore.unionByName(fr1)), labels)
    phStore = phStore.unionByName(ph1)
    frStore = frStore.unionByName(fr1)

    // batch 2: doc 2 shares frames {1,2} with the {102,103} family
    val ph2 = Seq((2L, 700L)).toDF("doc_id", "phash")
    val fr2 = Seq((2L, 1L), (2L, 2L)).toDF("doc_id", "fhash")
    labels = Clustering.mergeEdgesIntoLabels(
      pairs(ph2, phStore, fr2, frStore.unionByName(fr2)), labels)
    phStore = phStore.unionByName(ph2)
    frStore = frStore.unionByName(fr2)

    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // from-scratch over the final stores must agree
    val scratch = Clustering.connectedComponents(
        pairs(phStore, phStore.limit(0), frStore, frStore))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 2L), (100L, 1L), (101L, 1L),
      (102L, 2L), (103L, 2L)))
    assert(got == scratch)
  }

  test("videoPairsTouching: merge-time rarity is monotone — a cap-crossing frame forms no new pairs and retracts nothing") {
    import spark.implicits._
    // two shared frames (11, 22), cap = 2 docs per frame
    val corpus = Seq((100L, 11L), (100L, 22L)).toDF("doc_id", "fhash")
    val b1 = Seq((1L, 11L), (1L, 22L)).toDF("doc_id", "fhash")
    val all1 = corpus.unionByName(b1)
    // merge 1: both frames sit in 2 docs ≤ cap → the pair forms
    val p1 = Multimodal.videoPairsTouching(b1, all1, cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(p1 == Seq((1L, 100L)))
    // batch 2 pushes both frames over the cap: no NEW pairs may form —
    // neither batch-to-corpus nor within-batch, even though docs 2 and
    // 3 share both frames with everything
    val b2 = Seq((2L, 11L), (2L, 22L), (3L, 11L), (3L, 22L)).toDF("doc_id", "fhash")
    val all2 = all1.unionByName(b2)
    val p2 = Multimodal.videoPairsTouching(b2, all2, cap = 2)
    assert(p2.isEmpty)
    // ...and the earlier merge STANDS: merging the (empty) batch-2 edge
    // set into the store leaves {1,100} clustered. This is the
    // documented monotone divergence from a from-scratch run over the
    // final index (which would see the now-common frames and cluster
    // nothing) — a production union-find dedup store never retracts.
    val store = Seq((1L, 1L), (100L, 1L)).toDF("id", "label")
    val after = Clustering.mergeEdgesIntoLabels(
        p2.select($"doc_a".as("a"), $"doc_b".as("b")), store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after == Seq((1L, 1L), (100L, 1L)))
  }
}
