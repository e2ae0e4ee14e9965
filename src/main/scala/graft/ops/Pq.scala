package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** PRODUCT QUANTIZATION (Jégou et al. 2011) — the ANN compression tier
  * between int8 scalar quantization ([[graft.functions.QuantExprs]], ~4×)
  * and nothing: split each vector into `m` subspaces, k-means each
  * subspace independently ([[Clustering.lloyd]] — the same deterministic
  * seeded trainer the IVF index uses), and store per subspace only the
  * nearest centroid's index. A `dim`-float vector becomes `m` small ints
  * — dim·4 bytes → m·ceil(log2 k / 8) (e.g. 16 floats → 4 codes: 16×), and
  * queries score against RECONSTRUCTED vectors (`d(q, recon(x))` — the
  * asymmetric distance of the paper, §II.C: the query stays exact, only
  * the corpus side is quantized).
  *
  * Scale shape: training is `m` independent Lloyd runs over SLICED
  * sub-vectors (slice is scan-local; each run's shuffle is the k-means
  * assignment aggregate); encoding is ONE map-side pass — the `m`
  * codebooks ride as `m` literal plan nodes into the native
  * `nearest_cell_l2` kernel, the [[Clustering.assignClusters]] rule
  * per subspace; reconstruction at query time is `m` literal-array
  * lookups + `flatten`, feeding the same codegen'd cosine kernel the
  * exact paths use. Nothing driver-side but the codebooks
  * (m·k·subDim doubles — the bounded-collect class of the k-means
  * codebook itself).
  */
object Pq {

  /** Trained PQ model: `codebooks(j)` holds subspace j's `k` centroids,
    * each of length `subDim` (= dim / m).
    */
  final case class PqModel(m: Int, k: Int, subDim: Int,
      codebooks: Seq[Seq[Array[Double]]]) {
    def dim: Int = m * subDim
  }

  private def subCol(vecCol: String, j: Int, subDim: Int): Column =
    slice(col(vecCol), j * subDim + 1, subDim)

  /** Train per-subspace codebooks: `m` deterministic Lloyd runs (stride
    * init — same id-grid seeding as the IVF trainer) over the sliced
    * sub-vectors. `dim` must divide by `m`; `k ≤ 256` keeps a code a
    * logical byte.
    *
    * FUSED ACROSS SUBSPACES (r20, guide §1.2 — don't run m independent
    * job chains over the same rows): the r19 form ran, per subspace, its
    * own stride-init collect plus one assignment-stats job per Lloyd
    * round — (1 + iters)·m + 1 jobs per model (17 at m=4), each a full
    * pass over the corpus. The seeds of every subspace are slices of the
    * SAME k stride rows (one collect, sliced driver-side — identical
    * doubles), and one fused aggregate keyed (subspace, cluster, pos)
    * computes every subspace's round stats in ONE pass (same per-group
    * value sets as the m separate aggregates — each subspace keeps its
    * own deterministic Lloyd trajectory; the comparative gates' margins
    * are orders of magnitude above any summation-order ulp). Jobs per
    * model: 1 + iters (4 at the defaults) — and each round scans the
    * corpus once instead of m times.
    */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, stride: Long, iters: Int = 3): PqModel = {
    require(m >= 1 && k >= 2 && k <= 256, s"need 1 <= m, 2 <= k <= 256; got m=$m k=$k")
    val seedRows = df
      .filter(col(idCol) % stride === 0)
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect()
    require(seedRows.nonEmpty, s"cannot train PQ codebooks on an empty frame")
    require(seedRows.length == k, s"stride init found ${seedRows.length} of $k seeds")
    val seeds = seedRows.map(_.getSeq[Double](0).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"subspaces must tile the vector: dim=$dim m=$m")
    val subDim = dim / m
    var codebooks: IndexedSeq[IndexedSeq[Array[Double]]] = (0 until m).map(j =>
      seeds.toIndexedSeq.map(_.slice(j * subDim, (j + 1) * subDim)))
    for (_ <- 0 until iters) {
      // one pass: every subspace's (cluster, pos) sums under one key
      val perSub = array((0 until m).map { j =>
        struct(
          lit(j).as("j"),
          VectorExprs.nearest_cell_l2(
            subCol(vecCol, j, subDim).cast("array<double>"),
            typedLit(codebooks(j).indices.toList),
            typedLit(codebooks(j).map(_.toSeq))).as("cluster"),
          subCol(vecCol, j, subDim).cast("array<double>").as("v"))
      }: _*)
      val stats = df.select(explode(perSub).as("e"))
        .select(col("e.j").as("j"), col("e.cluster").as("cluster"),
          posexplode(col("e.v")))
        .groupBy(col("j"), col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          (r.getDouble(3), r.getLong(4))))
        .toMap
      codebooks = (0 until m).map { j =>
        codebooks(j).zipWithIndex.map { case (old, ci) =>
          Array.tabulate(subDim) { d =>
            stats.get((j, ci, d)).map { case (s, n) => s / n }.getOrElse(old(d))
          }
        }
      }
    }
    PqModel(m, k, subDim, codebooks.map(_.toSeq))
  }

  /** Encode: `pq_codes` = array of `m` nearest-centroid indices, one
    * native `nearest_cell_l2` kernel call per subspace over its sliced
    * sub-vector — map-side only, codebooks as single literal nodes.
    */
  def encode(df: DataFrame, vecCol: String, model: PqModel): DataFrame = {
    val codes = (0 until model.m).map { j =>
      VectorExprs.nearest_cell_l2(
        subCol(vecCol, j, model.subDim).cast("array<double>"),
        typedLit(model.codebooks(j).indices.toList),
        typedLit(model.codebooks(j).map(_.toSeq)))
    }
    df.withColumn("pq_codes", array(codes: _*))
  }

  /** The decoded (reconstructed) vector of a code array: per subspace,
    * the indexed centroid from the literal codebook, flattened back to
    * full dimension. Pure Column — rides into the native float kernels.
    */
  def reconstruct(codesCol: Column, model: PqModel): Column =
    flatten(array((0 until model.m).map { j =>
      element_at(typedLit(model.codebooks(j).map(_.toSeq)), codesCol.getItem(j) + 1)
    }: _*))

  /** IVF-PQ serving index (the FAISS `IVFx,PQy` composition): the coarse
    * IVF assignment keeps its cell key for probe pruning, and the vector
    * payload becomes PQ codes — `(cell, id, pq_codes)`. The float column
    * is dropped: cell routing already happened at build time, and queries
    * score reconstructions, so the serving table is m logical bytes per
    * vector AND prunes to nProbe cells per query.
    */
  def ivfPqIndex(assigned: DataFrame, vecCol: String, model: PqModel): DataFrame =
    encode(assigned, vecCol, model).select(col("cell"), col("id"), col("pq_codes"))

  /** IVF-PQ query: probe the `nProbe` nearest cells (the shared
    * [[Similarity.probeCells]] head — identical routing to the exact and
    * int8 IVF paths), then ADC-score ONLY those cells' codes. The two
    * prunings compose: candidate generation touches nProbe cells of an
    * m-bytes-per-vector table — the serving shape a 10⁹-vector corpus
    * needs.
    */
  def ivfPqQuery(
      queries: DataFrame, centroids: DataFrame, ivfPq: DataFrame,
      idCol: String, vecCol: String, k: Int, model: PqModel,
      nProbe: Int = 4): DataFrame = {
    val qProbes = Similarity.probeCells(queries, centroids, idCol, vecCol, nProbe)
    val scored = ivfPq
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        VectorExprs.cosine_f(
          col("q_vec").cast("array<double>"),
          reconstruct(col("pq_codes"), model)).as("cosine"))
    Similarity.topK(scored, k)
  }

  /** RESIDUAL IVF-PQ (the accuracy refinement production IVF-PQ systems
    * use, Jégou et al. §III): PQ-encode each vector's RESIDUAL against
    * its coarse cell centroid instead of the raw vector. The coarse
    * quantizer already explains the between-cluster structure, so the
    * per-subspace codebooks spend their bits on the small within-cell
    * displacement. How much that buys depends on the residual geometry:
    * on the clustered fixture (isotropic 0.05-σ gaussian residuals — the
    * hardest case, no further structure to exploit) it is a measured
    * 1.6× error reduction at identical code size; on corpora whose
    * within-cell displacement is itself clustered, far more. q175 pins
    * the ≥1.25× fixture margin.
    *
    * `assigned` must carry `(cell, id, vecCol)`; `centroids`
    * `(cell, centroid)`. Training and encoding both run on the joined
    * residual column (`zip_with` subtraction — the join is the same
    * broadcast the assignment made); reconstruction adds the centroid
    * back per row.
    */
  def trainResiduals(
      assigned: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, stride: Long, iters: Int = 3): PqModel = {
    train(withResidual(assigned, centroids, vecCol), idCol, "__res", m, k, stride, iters)
  }

  private def withResidual(
      assigned: DataFrame, centroids: DataFrame, vecCol: String): DataFrame =
    assigned.join(broadcast(centroids), "cell")
      .withColumn("__res",
        zip_with(col(vecCol).cast("array<double>"),
          col("centroid").cast("array<double>"), (x, y) => x - y))

  /** Residual serving index: `(cell, id, pq_codes)` where the codes
    * describe the vector's displacement from its cell centroid.
    */
  def ivfPqIndexResidual(
      assigned: DataFrame, centroids: DataFrame, vecCol: String,
      model: PqModel): DataFrame =
    encode(withResidual(assigned, centroids, vecCol), "__res", model)
      .select(col("cell"), col("id"), col("pq_codes"))

  /** Residual IVF-PQ query: probe cells as usual, reconstruct each
    * candidate as centroid + decoded residual (the centroid is already
    * ON the row — the cell join the probe made), score with the native
    * cosine kernel.
    */
  def ivfPqQueryResidual(
      queries: DataFrame, centroids: DataFrame, ivfPq: DataFrame,
      idCol: String, vecCol: String, k: Int, model: PqModel,
      nProbe: Int = 4): DataFrame = {
    val qProbes = Similarity.probeCells(queries, centroids, idCol, vecCol, nProbe)
    val scored = ivfPq
      .join(broadcast(centroids), "cell")
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        VectorExprs.cosine_f(
          col("q_vec").cast("array<double>"),
          zip_with(col("centroid").cast("array<double>"),
            reconstruct(col("pq_codes"), model), (x, y) => x + y)).as("cosine"))
    Similarity.topK(scored, k)
  }

  /** Asymmetric-distance top-k: exact queries against the quantized
    * corpus — [[Similarity.bruteTopK]]'s shape (broadcast queries, per-
    * query window rank) with the target side DECODED FROM CODES ONLY;
    * the float corpus column never appears in the plan, which is the
    * point: at 100 TB the serving scan reads m logical bytes per vector,
    * not dim floats.
    */
  def adcTopK(
      queries: DataFrame, encoded: DataFrame,
      idCol: String, vecCol: String, k: Int, model: PqModel): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec")))
    val t = encoded.select(col(idCol).as("neighbor_id"),
      reconstruct(col("pq_codes"), model).as("t_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(t, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        VectorExprs.cosine_f(col("q_vec"), col("t_vec")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }
}
