package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine match hand-computed values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val row = df.select(
      Similarity.dot($"a", $"b").as("dot"),
      Similarity.norm($"a").as("na"),
      Similarity.cosine($"a", $"b").as("cos")).head()
    assert(row.getDouble(0) === 4.0)          // 2 + 0 + 2
    assert(row.getDouble(1) === 3.0)          // sqrt(9)
    assert(math.abs(row.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("bruteTopK returns k exact nearest neighbors, self excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteTopK(vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(top.toSeq.sorted === Seq((1, 1L), (2, 4L)))
  }

  test("lshTopK achieves reasonable recall vs brute force on clustered data") {
    // two tight clusters + noise: neighbors within a cluster share sketch
    // buckets with high probability across 4 tables
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]) = base.map(v => v + rnd.nextFloat() * 0.05f)
    val c1 = Array.fill(8)(0.0f).updated(0, 1.0f).updated(1, 1.0f)
    val c2 = Array.fill(8)(0.0f).updated(6, -1.0f).updated(7, 1.0f)
    val rows = (0L until 20L).map(i => (i, jitter(if (i < 10) c1 else c2)))
    val vecs = rows.toDF("vec_id", "embedding")
    val probes = vecs.filter($"vec_id" < 2)
    val brute = Similarity.bruteTopK(probes, vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(probes, vecs, "vec_id", "embedding", dim = 8, k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall (brute=$brute lsh=$lsh)")
  }
}
