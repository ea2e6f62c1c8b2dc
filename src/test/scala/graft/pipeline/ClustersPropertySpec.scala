package graft.pipeline

import org.scalacheck.Gen

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.{PropertyChecks, SparkTestSession}

/** Property check: the distributed min-label propagation equals a
  * driver-side union-find on random graphs — including shapes that stress
  * the loop (long chains needing many rounds, stars, parallel edges,
  * self-contained cliques).
  */
class ClustersPropertySpec extends AnyFunSuite with PropertyChecks {
  private lazy val spark = SparkTestSession.spark

  override protected val propertyIterations: Int = 15

  // up to 40 nodes over a sparse id space, up to 60 edges (dups likely)
  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 39L); b <- Gen.choose(0L, 39L) if a != b
    } yield if (a < b) (a, b) else (b, a))
  } yield edges

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min id of the component = the root under min-union
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("clustersOf equals driver-side union-find on random graphs") {
    import spark.implicits._
    forAll(edgesGen) { edges =>
      val expected = unionFind(edges)
      val sizes = expected.groupBy(_._2).map { case (lbl, m) => lbl -> m.size.toLong }
      val got = Dedup.clustersOf(edges.toDF("id_a", "id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length === expected.size)
      got.foreach { case (node, cluster, size) =>
        assert(cluster === expected(node), s"node $node")
        assert(size === sizes(cluster), s"cluster $cluster size")
      }
    }
  }
}
