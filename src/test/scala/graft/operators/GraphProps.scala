package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

/** ScalaCheck pinning of the graph-mining kernels (X134/X141) against
  * brute-force references over RANDOM graphs — the gate corpus only
  * exercises the clique-ish families the planted dups produce; random
  * graphs exercise wedges, bridges, overlapping triangles and
  * degree-tie orientation cases the data never shows.
  *
  * Each case runs real Spark plans over a materialized FrameStore, so
  * the test count is kept small (the brute references are O(n³)/O(m²)
  * on tiny graphs). */
object GraphProps extends Properties("GraphKernels") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.SparkSpec.spark

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 20)
    raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
  } yield raw.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct

  /** Brute-force per-node triangle counts: every id triple. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if has(a, b) && has(a, c) && has(b, c)
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    nodes.map(n => n -> counts(n)).toMap
  }

  /** Brute-force per-edge support: common neighbors of the endpoints. */
  private def bruteSupport(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      nbrs(a) = nbrs(a) + b; nbrs(b) = nbrs(b) + a
    }
    edges.map { case (a, b) => (a, b) -> (nbrs(a) & nbrs(b)).size.toLong }.toMap
  }

  private def store(edges: Seq[(Long, Long)]): Graph.FrameStore = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    Graph.materializeFrame(edges.toDF("doc_a", "doc_b"))
  }

  property("triangleCounts == brute-force triple enumeration") =
    forAll(genEdges) { edges =>
      edges.isEmpty || {
        val s = store(edges)
        try {
          val got = Graph.triangleCounts(s).collect()
            .map(r => r.getLong(0) -> r.getLong(2)).toMap
          got == bruteTriangles(edges)
        } finally s.release()
      }
    }

  property("per-edge triangle support == common-neighbor count") =
    forAll(genEdges) { edges =>
      edges.isEmpty || {
        val s = store(edges)
        try {
          import org.apache.spark.sql.functions.{greatest, least}
          val tri = Graph.triangleFrame(s)
          val sup = Seq(("x", "y"), ("x", "z"), ("y", "z"))
            .map { case (c1, c2) =>
              tri.select(least(tri(c1), tri(c2)).as("a"),
                greatest(tri(c1), tri(c2)).as("b")) }
            .reduce(_ unionByName _)
            .groupBy("a", "b").count()
            .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
          val brute = bruteSupport(edges)
          brute.forall { case (e, n) => sup.getOrElse(e, 0L) == n }
        } finally s.release()
      }
    }

  // ------------------------------------------------------------------
  // Round-13 kernels: sparse-cosine pairs (X191) and Bellman-Ford
  // cheapest costs (X192) against brute references on random inputs —
  // random tf grids exercise scaled/partial-overlap vectors beyond the
  // planted families, random weighted graphs exercise multi-hop
  // shortcuts and horizon cuts beyond the fixture's shapes.
  // ------------------------------------------------------------------

  private val genTfDocs: Gen[Seq[(Long, Map[Long, Long])]] = for {
    nDocs <- Gen.choose(3, 12)
    docs <- Gen.sequence[Seq[(Long, Map[Long, Long])], (Long, Map[Long, Long])](
      (0 until nDocs).map { d =>
        for {
          nT <- Gen.choose(1, 6)
          hs <- Gen.listOfN(nT, Gen.zip(Gen.choose(0L, 15L), Gen.choose(1L, 4L)))
        } yield (d.toLong, hs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
      })
  } yield docs

  property("sparseCosinePairs == brute multiset cosine at t = 4/5 (df-cap not binding)") =
    forAll(genTfDocs) { docs =>
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      import org.apache.spark.sql.functions.{col, explode}
      // n <= 12 docs < SpcDfCap = 20, so the boilerplate guard never
      // binds and the brute reference is the pure cosine predicate
      val tf = docs.flatMap { case (d, m) => m.map { case (h, t) => (d, h, t) } }
        .toDF("doc_id", "h", "tf")
      val got = Dedup.sparseCosinePairs(tf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ids = docs.map(_._1)
      val want = (for {
        i <- ids.indices; j <- (i + 1) until ids.length
        a = docs(i)._2; b = docs(j)._2
        dot = a.keysIterator.map(h => a(h) * b.getOrElse(h, 0L)).sum
        na2 = a.valuesIterator.map(v => v * v).sum
        nb2 = b.valuesIterator.map(v => v * v).sum
        if BigInt(25) * BigInt(dot) * BigInt(dot) >=
          BigInt(16) * BigInt(na2) * BigInt(nb2)
      } yield (ids(i), ids(j))).toSet
      got == want
    }

  private val genWeighted: Gen[(Seq[(Long, Long, Long)], Set[Long])] = for {
    n <- Gen.choose(3, 8)
    m <- Gen.choose(2, 14)
    raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong),
      Gen.choose(0L, n.toLong), Gen.choose(1L, 50L)))
    edges = raw.collect { case (a, b, w) if a != b => (a, b, w) }
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
    seeds <- Gen.nonEmptyListOf(Gen.oneOf(edges.flatMap(e => Seq(e._1, e._2)).distinct))
  } yield (edges, seeds.toSet)

  property("cheapestCosts == brute Bellman-Ford over <= K-edge paths") =
    forAll(genWeighted) { case (edges, seeds) =>
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      edges.isEmpty || {
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val es = Graph.materializeEdges(() => edges.toDF("src", "dst", "w"))
        val sf = Graph.materializeFrame(
          nodes.map(n => (n, if (seeds(n)) 1 else 0)).toDF("id", "is_seed"))
        try {
          val got = Graph.cheapestCosts(es, sf)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          // brute: K rounds of relaxation over the directed edge list
          val inf = 1L << 62
          var d = nodes.map(n => n -> (if (seeds(n)) 0L else inf)).toMap
          (1 to Graph.CheapRounds).foreach { _ =>
            val relax = edges.groupBy(_._2).map { case (v, in) =>
              v -> in.map(e => d(e._1) match {
                case x if x >= inf => inf
                case x => x + Graph.CostScale / e._3
              }).min
            }
            d = d.map { case (v, dv) =>
              v -> math.min(dv, relax.getOrElse(v, inf))
            }
          }
          got == d
        } finally { es.release(); sf.release() }
      }
    }

  property("lpaLabels == brute synchronous weighted-vote LPA on random directed weighted graphs") =
    forAll(genWeighted) { case (edges, _) =>
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      edges.isEmpty || {
        val es = Graph.materializeEdges(() => edges.toDF("src", "dst", "w"))
        try {
          val got = Graph.lpaLabels(es)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          // brute: label_0(v) = v over DISTINCT sources (lpaLabels'
          // node set); each round every dst with incoming votes adopts
          // the label with max incident weight mass, ties to min label;
          // dsts without votes drop out (same as the frame semantics)
          var lbl = edges.map(_._1).distinct.map(v => v -> v).toMap
          (1 to Graph.LpaRounds).foreach { _ =>
            lbl = edges.filter(e => lbl.contains(e._1))
              .groupBy(_._2).map { case (v, in) =>
                val mass = in.groupBy(e => lbl(e._1))
                  .view.mapValues(_.map(_._3).sum).toMap
                val best = mass.toSeq.sortBy { case (l, m) => (-m, l) }.head._1
                v -> best
              }
          }
          got == lbl
        } finally es.release()
      }
    }
}
