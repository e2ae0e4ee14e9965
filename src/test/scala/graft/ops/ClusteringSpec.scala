package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the deterministic Lloyd's operator ([[Clustering]]):
  * map-side argmin assignment (with the lowest-index tie-break), centroid
  * updates as exact means, empty-cluster retention, convergence on
  * separated data, and reshuffle-stability of the assignment.
  */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private def twoBlobs = Seq(
    // blob A around (0, 0), blob B around (10, 10)
    (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(10.0f, 10.0f)), (4L, Seq(11.0f, 10.0f)), (5L, Seq(10.0f, 11.0f))
  ).toDF("id", "vec")

  test("assignClusters: nearest centroid wins; ties break to the lowest index") {
    val cents = Seq(Array(0.0, 0.0), Array(10.0, 10.0))
    val got = Clustering.assignClusters(twoBlobs, "vec", cents)
      .select("id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1))

    // a point exactly equidistant from two identical centroids → index 0
    val tied = Seq((9L, Seq(5.0f, 5.0f))).toDF("id", "vec")
    val sameCents = Seq(Array(0.0, 0.0), Array(10.0, 10.0), Array(0.0, 0.0))
    val t = Clustering.assignClusters(tied, "vec", sameCents)
      .select("cluster").head().getInt(0)
    assert(t === 0, "equidistant assignment must break ties to the lowest index")
  }

  test("lloyd: centroids converge to the blob means; second round shifts ~0") {
    val init = Seq(Array(2.0, 2.0), Array(8.0, 8.0))
    val m = Clustering.lloyd(twoBlobs, "vec", init, iters = 2)
    val Seq(a, b) = m.centroids
    assert(a.zip(Array(1.0 / 3, 1.0 / 3)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    assert(b.zip(Array(31.0 / 3, 31.0 / 3)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // assignments stabilized after round 1, so round 2 recomputes the same
    // means — shift collapses to ~0 (ulp-level only)
    assert(m.lastShift < 1e-9, s"expected converged shift, got ${m.lastShift}")
  }

  test("lloyd: a centroid that captures no points keeps its previous position") {
    val init = Seq(Array(0.0, 0.0), Array(10.0, 10.0), Array(1000.0, 1000.0))
    val m = Clustering.lloyd(twoBlobs, "vec", init, iters = 1)
    assert(m.centroids(2).toSeq === Seq(1000.0, 1000.0),
      "empty cluster must retain its previous centroid, not collapse to NaN")
  }

  test("assignment is a pure function of (data, centroids): stable under repartition") {
    val cents = Seq(Array(0.0, 0.0), Array(10.0, 10.0))
    val once = Clustering.assignClusters(twoBlobs, "vec", cents).select("id", "cluster")
    val again = Clustering.assignClusters(twoBlobs.repartition(7), "vec", cents)
      .select("id", "cluster")
    assert(once.except(again).isEmpty && again.except(once).isEmpty)
  }

  test("semdedup: twins pair within their cluster; keepers drop the higher id only") {
    val cents = Seq(Array(0.0, 0.0), Array(10.0, 10.0))
    // id 6 is a near-twin of id 0; id 7 a near-twin of id 4 (other blob)
    val withTwins = twoBlobs.unionByName(
      Seq((6L, Seq(0.001f, 0.0f)), (7L, Seq(11.0f, 10.001f))).toDF("id", "vec"))
    val pairs = Clustering.withinClusterDupPairs(withTwins, "id", "vec", cents, maxDist = 0.05)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 6L), (4L, 7L)),
      "only the planted twins sit under the radius, and only within their cluster")
    val keep = Clustering.semanticKeepers(withTwins, "id", "vec", cents, maxDist = 0.05)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep === Map(0L -> true, 1L -> true, 2L -> true, 3L -> true,
      4L -> true, 5L -> true, 6L -> false, 7L -> false))
  }

  test("strideInit: picks every stride-th id in order, fails loudly when short") {
    val seeds = Clustering.strideInit(twoBlobs, "id", "vec", k = 2, stride = 3)
    assert(seeds(0).toSeq === Seq(0.0, 0.0), "seed 0 must be id 0's vector")
    assert(seeds(1).toSeq === Seq(10.0, 10.0), "seed 1 must be id 3's vector")
    val e = intercept[IllegalArgumentException] {
      Clustering.strideInit(twoBlobs, "id", "vec", k = 5, stride = 3)
    }
    assert(e.getMessage.contains("stride init found"))
  }
}
