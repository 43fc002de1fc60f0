package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

/** ScalaCheck pinning of the two algebraic theorems the incremental
  * cluster-maintenance family (X125–X128) rests on, against a local
  * union-find reference over RANDOM graphs — the gate corpora only
  * exercise the component shapes the data happens to contain:
  *
  *  1. merge(batch edges, closure(corpus edges)) == closure(all edges)
  *     for ANY edge partition (closure-of-contraction = closure, given
  *     stored labels are true component minima);
  *  2. retract(r) via bounded re-closure of r's survivors ==
  *     closure(edges with r filtered out), for r a component
  *     representative.
  *
  * Each case runs real Spark closures, so the test count is kept
  * small; the graphs are tiny but adversarial (random multi-edges,
  * bridges, chains, self-contained families). */
object IncrementalClosureProps extends Properties("IncrementalClosure") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.SparkSpec.spark

  /** Reference labels: union-find with min-id representatives over the
    * nodes that appear in at least one edge. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 16)
    raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
  } yield raw.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct

  private def df(pairs: Seq[(Long, Long)], c1: String, c2: String) = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    pairs.toDF(c1, c2)
  }

  property("merge(batch, closure(corpus)) == closure(all) for any split") =
    forAll(genEdges, Gen.choose(0, 100)) { (edges, splitPct) =>
      val (corpus, batch) = edges.zipWithIndex.partition {
        case (_, i) => i * 100 < splitPct * math.max(1, edges.size)
      } match { case (c, b) => (c.map(_._1), b.map(_._1)) }
      val store =
        if (corpus.isEmpty) df(Seq.empty, "id", "label")
        else Clustering.connectedComponents(df(corpus, "a", "b"))
      val merged = Clustering.mergeEdgesIntoLabels(df(batch, "a", "b"), store)
      val got = merged.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      got == ufLabels(edges)
    }

  property("retract(representative) via bounded survivor re-closure == closure without the doc") =
    forAll(genEdges) { edges =>
      edges.isEmpty || {
        val full = ufLabels(edges)
        val r = full.keys.min // global min node — its component's representative
        val survivorPairs = edges.filter { case (a, b) =>
          a != r && b != r && full(a) == r && full(b) == r
        }
        val store = Clustering.connectedComponents(df(edges, "a", "b"))
        val got = Clustering.retractFromLabels(store, r, df(survivorPairs, "a", "b"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
        got == ufLabels(edges.filter { case (a, b) => a != r && b != r })
      }
    }
}
