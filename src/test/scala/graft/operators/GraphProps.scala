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
}
