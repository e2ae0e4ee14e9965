package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // a 2×2 lattice: every vector is an exact combination of the two
  // sub-centroids per subspace, so training recovers the lattice and
  // encoding is lossless
  private def lattice = Seq(
    (0L, Seq(1f, 1f, 1f, 1f)),
    (1L, Seq(10f, 10f, 10f, 10f)),
    (2L, Seq(1f, 1f, 10f, 10f)),
    (3L, Seq(10f, 10f, 1f, 1f))).toDF("vec_id", "embedding")

  test("train recovers lattice codebooks; encode is exact on lattice points") {
    val model = Pq.train(lattice, "vec_id", "embedding", m = 2, k = 2, stride = 1L)
    assert(model.subDim === 2 && model.codebooks.size === 2)
    assert(model.codebooks.forall(_.size === 2))
    val enc = Pq.encode(lattice, "embedding", model)
    val err = enc.select(graft.functions.VectorExprs.dist2_f(
        col("embedding").cast("array<double>"),
        Pq.reconstruct(col("pq_codes"), model)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(err === 0.0, s"lattice points must reconstruct exactly, max dist2 = $err")
    // distinct vectors get distinct code words here (both subspaces split)
    assert(enc.select(col("pq_codes")).distinct().count() === 4L)
  }

  test("adcTopK finds the true neighbor from codes alone") {
    val model = Pq.train(lattice, "vec_id", "embedding", m = 2, k = 2, stride = 1L)
    val enc = Pq.encode(lattice, "embedding", model).select(col("vec_id"), col("pq_codes"))
    val probes = Seq((100L, Seq(1f, 1f, 1f, 2f))).toDF("vec_id", "embedding")
    val got = Pq.adcTopK(probes, enc, "vec_id", "embedding", k = 1, model)
      .select(col("neighbor_id")).head().getLong(0)
    assert(got === 0L, "probe next to (1,1,1,1) must resolve to vector 0")
  }

  test("ivfPqQuery prunes to probed cells and serves from codes alone") {
    val model = Pq.train(lattice, "vec_id", "embedding", m = 2, k = 2, stride = 1L)
    // hand-built coarse structure: cell 0 = low corner, cell 1 = high
    val assigned = Seq(
      (0L, 0L, Seq(1f, 1f, 1f, 1f)),
      (0L, 2L, Seq(1f, 1f, 10f, 10f)),
      (1L, 1L, Seq(10f, 10f, 10f, 10f)),
      (1L, 3L, Seq(10f, 10f, 1f, 1f))).toDF("cell", "id", "vec")
    val centroids = Seq(
      (0L, Seq(1f, 1f, 5f, 5f)), (1L, Seq(10f, 10f, 5f, 5f)))
      .toDF("cell", "centroid")
    val served = Pq.ivfPqIndex(assigned, "vec", model)
    // the serving table carries codes, never the float vector
    assert(served.columns.toSeq === Seq("cell", "id", "pq_codes"))
    val probes = Seq((100L, Seq(1f, 1f, 1f, 2f))).toDF("vec_id", "embedding")
    val got = Pq.ivfPqQuery(probes, centroids, served, "vec_id", "embedding",
        k = 3, model, nProbe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // nProbe=1 → only cell 0's members are candidates, ranked from codes
    assert(got === Set(0L, 2L))
  }

  test("residual encoding is exact when residuals lattice; plain PQ cannot be") {
    // two far cells, each holding the centroid ± the SAME unit offset:
    // residuals form a 2-value lattice per subspace (k=2 suffices
    // exactly), while plain PQ sees 4 distinct sub-values per subspace
    // and must lose information at k=2
    val assigned = Seq(
      (0L, 1L, Seq(1f, 1f, 1f, 1f)),
      (0L, 2L, Seq(-1f, -1f, -1f, -1f)),
      (1L, 3L, Seq(101f, 101f, 101f, 101f)),
      (1L, 4L, Seq(99f, 99f, 99f, 99f))).toDF("cell", "id", "vec")
    val centroids = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(100f, 100f, 100f, 100f)))
      .toDF("cell", "centroid")
    val res = Pq.trainResiduals(assigned, centroids, "id", "vec",
      m = 2, k = 2, stride = 1L)
    val servedR = Pq.ivfPqIndexResidual(assigned, centroids, "vec", res)
    val errR = assigned.join(servedR, Seq("cell", "id")).join(centroids, "cell")
      .select(graft.functions.VectorExprs.dist2_f(
        col("vec").cast("array<double>"),
        zip_with(col("centroid").cast("array<double>"),
          Pq.reconstruct(col("pq_codes"), res), (x, y) => x + y)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(errR === 0.0, s"lattice residuals must reconstruct exactly, max dist2 = $errR")
    val plain = Pq.train(assigned, "id", "vec", m = 2, k = 2, stride = 1L)
    val errP = Pq.encode(assigned, "vec", plain)
      .select(graft.functions.VectorExprs.dist2_f(
        col("vec").cast("array<double>"),
        Pq.reconstruct(col("pq_codes"), plain)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(errP > 0.0, "plain PQ at k=2 cannot represent 4 sub-values exactly")
  }

  test("contract violations fail loudly") {
    assertThrows[IllegalArgumentException] { // 4 dims don't tile into 3 subspaces
      Pq.train(lattice, "vec_id", "embedding", m = 3, k = 2, stride = 1L)
    }
    assertThrows[IllegalArgumentException] { // codes must stay a logical byte
      Pq.train(lattice, "vec_id", "embedding", m = 2, k = 257, stride = 1L)
    }
  }
}
