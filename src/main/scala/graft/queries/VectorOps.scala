package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Similarity

/** Embedding / similarity-search battery over `embeddings` (array<float>,
  * dim 64). Dot products are left-to-right double folds on both engines so
  * the oracle is bit-stable (see [[graft.ops.Similarity]]).
  *
  * The approximate paths (q37 LSH, q38 IVF, q39 near-dup) are gated with
  * PLANTED inputs: probes/duplicates are deterministic double-precision
  * perturbations (x·1.001 + 0.0005) of corpus vectors, so the true nearest
  * neighbor has cosine ≈ 1 — which an LSH sketch collides on in every
  * table and an IVF probe finds in its top cell — while i.i.d. cross pairs
  * stay ≤ ~0.51. That makes the approximate result exactly predictable and
  * hash-verifiable in DuckDB (the r3 gate had no oracle at all for these;
  * a recall-vs-brute flag can't work here because LSH recall on uniform
  * random top-k is near zero BY MATH — θ ≈ 60° collides at ~2.5% per
  * 8-plane table).
  */
object VectorOps {

  private val oracleDot =
    "list_sum(list_transform(generate_series(1, 64), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  /** Deterministic planted twin of a vector set: ids shifted by 100000,
    * every element x → x·1.001 + 0.0005 in DOUBLE (bit-identical on both
    * engines; float→double cast is exact).
    */
  private def planted(e: org.apache.spark.sql.DataFrame) =
    e.select(
      (col("vec_id") + lit(100000)).as("vec_id"),
      transform(col("embedding"), x => x.cast("double") * lit(1.001) + lit(0.0005))
        .as("embedding"))

  /** DuckDB twin of [[planted]] + exact cosine against the original — the
    * closed-form expected answer for the planted-NN queries (valid because
    * i.i.d. cross-pair cosines max out near 0.51, far below both the 0.95
    * near-dup threshold and any rank-1 contest).
    */
  private def plantedCosineSql(idFilter: String): String = {
    val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001 + 0.0005)"
    val ov = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    s"""
      WITH p AS (
        SELECT vec_id, $pv AS pv, $ov AS ov
        FROM embeddings $idFilter)
      SELECT vec_id + 100000 AS q_id, vec_id AS neighbor_id,
        round(${oracleDot.format("pv", "ov")} /
          (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("ov", "ov")})),
          4) AS cosine
      FROM p ORDER BY q_id"""
  }

  /** Root for this JVM's offline index artifacts. Process-unique: the
    * index dirs are written `mode("overwrite")` once per JVM, so two
    * concurrent graft JVMs (a bench run beside a test run) sharing a
    * fixed path would delete each other's files mid-read — observed as a
    * q68 FILE_NOT_EXIST when a registry sweep overlapped a bench. The
    * per-process root removes the collision class; at 100 TB the real
    * index build writes to a durable, job-owned location anyway.
    *
    * Disk hygiene (ADVICE r7 — per-pid dirs accumulated forever): a
    * shutdown hook removes THIS process's roots on clean exit, and init
    * sweeps roots whose owning pid is gone (covers kills/crashes, where
    * no hook ran).
    */
  private val procRoot: String = {
    val base = new java.io.File("/tmp/graft_ivf")
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    val mine = s"p${ProcessHandle.current().pid()}"
    Option(base.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { d =>
      // roots are p<pid> plus suffixed variants (p<pid>_q, p<pid>_lsh, …)
      val pid = d.getName.stripPrefix("p").takeWhile(_.isDigit)
      val stale = d.getName.startsWith("p") && pid.nonEmpty &&
        ProcessHandle.of(pid.toLong).isEmpty
      if (stale) rm(d)
    }
    sys.addShutdownHook {
      Option(base.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(d => d.getName == mine || d.getName.startsWith(mine + "_"))
        .foreach(rm)
    }
    s"/tmp/graft_ivf/$mine"
  }

  /** q38's disk-backed IVF index, built once per (JVM, sfDir) — the index
    * build is an offline job (VERDICT r3: a query must not train its own
    * quantizer); the gate/bench measure the query path against the stored
    * cell-partitioned index.
    */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]

  private def ivfIndexFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    ivfCache.getOrElseUpdate(dir, {
      val path = s"$procRoot/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
          nCentroids = 16, seed = 42L),
        path)
      Similarity.readIvfIndex(s, path)
    })

  /** q82's QUANTIZED IVF index (int8 codes + corners alongside the float
    * vectors, cell-partitioned) — same offline-build contract as
    * [[ivfIndexFor]].
    */
  private val ivfQuantCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]

  private def ivfQuantIndexFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    ivfQuantCache.getOrElseUpdate(dir, {
      val path = s"${procRoot}_q/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Similarity.writeIvfIndexQuantized(
        Similarity.buildIvfIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
          nCentroids = 16, seed = 42L),
        path)
      Similarity.readIvfIndex(s, path)
    })

  /** q88's quantized LSH index (codes + corners + build-time buckets of
    * the dequantized reconstruction) — same offline-build contract.
    */
  private val lshQuantCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  private def lshQuantIndexFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    lshQuantCache.getOrElseUpdate(dir, {
      val path = s"${procRoot}_lsh/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Similarity.writeLshIndexQuantized(
        Similarity.buildLshIndexQuantized(Tables.embeddings(s, dir), "vec_id", "embedding"),
        path)
      s.read.parquet(path)
    })

  /** Shared oracle for the quantized-ANN planted-NN gates (q82 IVF route,
    * q88 LSH route): DuckDB recomputes codes + dequant + the left-to-right
    * cosine fold closed-form. Two physical routes, ONE oracle.
    */
  private lazy val plantedQuantNnSql: String = {
    val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001 + 0.0005)"
    s"""
          WITH p AS (
            SELECT vec_id, $pv AS pv FROM embeddings WHERE vec_id < 5),
          base AS (
            SELECT vec_id,
              CAST(list_min(embedding) AS DOUBLE) AS mn,
              CAST(list_max(embedding) AS DOUBLE) AS mx,
              embedding
            FROM embeddings),
          dq AS (
            SELECT vec_id,
              CASE WHEN mx = mn THEN list_transform(embedding, x -> mn)
                   ELSE list_transform(embedding, x ->
                     mn + floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5)
                          * (mx - mn) / 255.0)
              END AS dv
            FROM base)
          SELECT p.vec_id + 100000 AS q_id, p.vec_id AS neighbor_id,
            round(${oracleDot.format("pv", "dv")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("dv", "dv")})),
              4) AS cosine
          FROM p JOIN dq ON dq.vec_id = p.vec_id ORDER BY q_id"""
  }

  /** Shared oracle for the INCREMENTAL-append quantized-NN gates (q116
    * IVF route, q122 LSH route): each original's rank-1 neighbor is its
    * appended twin, scored by the quantized cosine; DuckDB replays the
    * twin's double→float→double round-trip → corners → codes → dequant →
    * fold closed-form. Two incremental routes, ONE oracle.
    */
  private lazy val plantedAppendQuantNnSql: String = {
    val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    val tv = "list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) * 1.001 + 0.0005 AS FLOAT) AS DOUBLE))"
    s"""
          WITH p AS (
            SELECT vec_id, $pv AS pv, $tv AS tv
            FROM embeddings WHERE vec_id < 5),
          b AS (
            SELECT vec_id, pv, list_min(tv) AS mn, list_max(tv) AS mx, tv FROM p),
          dq AS (
            SELECT vec_id, pv,
              CASE WHEN mx = mn THEN list_transform(tv, x -> mn)
                   ELSE list_transform(tv, x ->
                     mn + floor((x - mn) * 255.0 / (mx - mn) + 0.5)
                          * (mx - mn) / 255.0)
              END AS dv
            FROM b)
          SELECT vec_id AS q_id, vec_id + 100000 AS neighbor_id,
            round(${oracleDot.format("pv", "dv")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("dv", "dv")})),
              4) AS cosine
          FROM dq ORDER BY q_id"""
  }

  /** q122's appended quantized LSH index: base build from the corpus,
    * planted twins appended O(batch) as float (the q115/q116 convention).
    * Built once per (JVM, sfDir).
    */
  private val lshAppendCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  private def lshAppendedFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    lshAppendCache.getOrElseUpdate(dir, {
      val path = s"${procRoot}_lshapp/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val e = Tables.embeddings(s, dir)
      Similarity.writeLshIndexQuantized(
        Similarity.buildLshIndexQuantized(e, "vec_id", "embedding"), path)
      Similarity.appendLshIndexQuantized(path,
        planted(e).select(col("vec_id"),
          transform(col("embedding"), _.cast("float")).as("embedding")),
        "vec_id", "embedding")
      s.read.parquet(path)
    })

  /** Seeded clustered-embedding fixture for the ANN recall gate (q68).
    * The planted twins (q37/q38) prove the pipelines EXACT on plantable
    * inputs, but recall on i.i.d. vectors is uninformative (LSH recall ≈ 0
    * there by construction — r4 lesson). A mixture of tight Gaussian
    * clusters is the corpus shape ANN is FOR: a probe's true top-k live in
    * its own cluster, so recall-vs-brute is meaningful and stably high.
    * Deterministic: fixed-seed driver RNG, fixed generation order; built
    * once per JVM (with its IVF index) like the other offline artifacts.
    */
  private val NClusters = 20
  private val PerCluster = 100
  private val FixtureDim = 16

  /** Drift-rebuild fixture constants (q117/q118) — declared BEFORE
    * [[defs]] like the clustered-fixture ones: the oracle strings read
    * them eagerly at object init.
    */
  private val DriftDim = 16
  private val DriftClusters = 10
  private val DriftPerCluster = 100

  private lazy val clusteredFixture
      : (Seq[(Long, Seq[Float])], Seq[(Long, Seq[Float])]) = {
    val rnd = new scala.util.Random(0xC1057E12L)
    def gaussVec(scale: Double, base: Array[Double] = Array.fill(FixtureDim)(0.0)) =
      Array.tabulate(FixtureDim)(i => base(i) + rnd.nextGaussian() * scale)
    val centers = Seq.fill(NClusters)(gaussVec(1.0))
    val corpus: Seq[(Long, Seq[Float])] = for {
      (c, cIdx) <- centers.zipWithIndex
      p <- 0 until PerCluster
    } yield ((cIdx.toLong * PerCluster + p),
      gaussVec(0.05, c).map(_.toFloat).toSeq)
    // probes: fresh draws from each cluster, NOT corpus members
    val probes: Seq[(Long, Seq[Float])] = centers.zipWithIndex.map { case (c, cIdx) =>
      (100000L + cIdx, gaussVec(0.05, c).map(_.toFloat).toSeq)
    }
    (corpus, probes)
  }

  private val clusteredCache = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      Similarity.IvfIndex, Similarity.IvfIndex)]

  private def clusteredFor(s: org.apache.spark.sql.SparkSession) =
    clusteredCache.getOrElseUpdate("clustered", {
      import s.implicits._
      val (corpusRows, probeRows) = clusteredFixture
      val corpus = corpusRows.toDF("vec_id", "embedding")
      val probes = probeRows.toDF("vec_id", "embedding")
      val path = s"$procRoot/clustered_fixture"
      val idx = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
        nCentroids = 16, seed = 42L)
      Similarity.writeIvfIndex(idx, path)
      val qPath = s"$procRoot/clustered_fixture_q"
      Similarity.writeIvfIndexQuantized(idx, qPath)
      (corpus, probes, Similarity.readIvfIndex(s, path),
        Similarity.readIvfIndex(s, qPath))
    })

  val defs: Seq[QueryDef] = Seq(

    // ANN quality gate on the clustered fixture: recall@5 vs brute for the
    // LSH and IVF paths, asserted in-query as boolean flags (the q51
    // error-bound pattern: the oracle emits the literal expected row, so a
    // recall regression hash-fails the gate). Thresholds have margin —
    // measured recall on this fixture is ~1.0; 0.8 is the contract.
    QueryDef(
      "q68_ann_recall_clustered",
      (s, _) => {
        val (corpus, probes, ivfIdx, ivfQIdx) = clusteredFor(s)
        val k = 5
        val brute = Similarity.bruteTopK(probes, corpus, "vec_id", "embedding", k)
          .select(col("q_id"), col("neighbor_id"))
        def recall(approx: org.apache.spark.sql.DataFrame) =
          approx.select(col("q_id"), col("neighbor_id"))
            .join(brute, Seq("q_id", "neighbor_id"))
            .agg((count(lit(1)).cast("double") / lit(NClusters * k)).as("r"))
        val lsh = recall(Similarity.lshTopK(probes, corpus, "vec_id", "embedding", k))
          .select(col("r").as("lsh_recall"))
        val ivf = recall(Similarity.ivfQuery(probes, ivfIdx, "vec_id", "embedding", k))
          .select(col("r").as("ivf_recall"))
        // the quantized route must hold the same recall bar: int8 codes
        // shift each cosine by ≤ half a step, far below the inter-cluster
        // separation, so rank order inside a cluster is preserved
        val ivfq = recall(Similarity.ivfQueryQuantized(probes, ivfQIdx,
            "vec_id", "embedding", k))
          .select(col("r").as("ivfq_recall"))
        lsh.crossJoin(ivf).crossJoin(ivfq).select(
          lit(NClusters.toLong).as("n_probes"),
          (col("lsh_recall") >= 0.8).as("lsh_recall_ok"),
          (col("ivf_recall") >= 0.8).as("ivf_recall_ok"),
          (col("ivfq_recall") >= 0.8).as("ivfq_recall_ok"))
      },
      Some("""
        SELECT CAST(20 AS BIGINT) AS n_probes,
               true AS lsh_recall_ok, true AS ivf_recall_ok,
               true AS ivfq_recall_ok""")),

    // LSH-APPEND RECALL UNDER DRIFT (r18 — VERDICT r17 next #8, the
    // q68-style certificate behind q122's "appends never need rebuild"
    // claim): the initial LSH index sees only HALF the clusters; the
    // other half — embedding regions the build never touched, exactly
    // the drift that collapses a frozen IVF codebook to ~0.4 recall
    // (q117's fixture) — arrives as two O(batch) appends. Because the
    // bucket hash is a data-INDEPENDENT hyperplane family, the appended
    // rows land in the same buckets a from-scratch rebuild would give
    // them, so recall@5 vs brute must hold the 0.8 bar BOTH overall and
    // restricted to the appended-only clusters, and the appended index
    // must equal the from-scratch rebuild on the grown corpus row for
    // row (the strongest form of the no-rebuild claim, pinned
    // deterministically). Flags measured from data; oracle emits the
    // literal expected row (q68 pattern).
    QueryDef(
      "q228_ann_lsh_append_recall",
      (s, _) => {
        import s.implicits._
        val (corpus, probes, _, _) = clusteredFor(s)
        val k = 5
        val half = (NClusters / 2) * PerCluster
        val q3 = half + (NClusters / 4) * PerCluster
        val seed = corpus.filter(col("vec_id") < half)
        val grow1 = corpus.filter(col("vec_id") >= half && col("vec_id") < q3)
        val grow2 = corpus.filter(col("vec_id") >= q3)
        val path = java.nio.file.Files.createTempDirectory("q228lsh").toString
        Similarity.writeLshIndexQuantized(
          Similarity.buildLshIndexQuantized(seed, "vec_id", "embedding"), path)
        Similarity.appendLshIndexQuantized(path, grow1, "vec_id", "embedding")
        Similarity.appendLshIndexQuantized(path, grow2, "vec_id", "embedding")
        val grown = s.read.parquet(path)
        val brute = Similarity.bruteTopK(probes, corpus, "vec_id", "embedding", k)
          .select(col("q_id"), col("neighbor_id"))
        val hits = Similarity
          .lshTopKQuantized(probes, grown, "vec_id", "embedding", k)
          .select(col("q_id"), col("neighbor_id"))
          .join(brute, Seq("q_id", "neighbor_id"))
          // probes 100000+cIdx: clusters >= NClusters/2 exist ONLY via
          // appends — their recall is the drift-immunity claim itself
          .withColumn("appended",
            col("q_id") - 100000L >= (NClusters / 2).toLong)
        // both recalls from ONE aggregate over the bucket join — no
        // scalar crossJoin (the registry sweep forbids all-pairs
        // shapes); materialized (localCheckpoint) BEFORE the index dir
        // is deleted below, which the lazy plan still reads
        val recalls = hits.agg(
          (count(lit(1)).cast("double") / lit(NClusters * k) >= 0.8)
            .as("recall_ok"),
          (sum(when(col("appended"), 1L).otherwise(0L)).cast("double") /
            lit((NClusters / 2) * k) >= 0.8)
            .as("appended_cluster_recall_ok"))
          .localCheckpoint()
        // append == rebuild, row for row (buckets, codes, and range all
        // deterministic functions of the vector): symmetric difference
        // of the two indexes must be empty
        val rebuilt = Similarity
          .buildLshIndexQuantized(corpus, "vec_id", "embedding")
        val diff = grown.exceptAll(rebuilt).count() +
          rebuilt.exceptAll(grown).count()
        graft.queries.EventOps.rmTree(path)
        recalls.select(
          lit(NClusters.toLong).as("n_probes"),
          col("recall_ok"),
          col("appended_cluster_recall_ok"),
          lit(diff == 0L).as("append_equals_rebuild"))
      },
      Some("""
        SELECT CAST(20 AS BIGINT) AS n_probes, true AS recall_ok,
               true AS appended_cluster_recall_ok,
               true AS append_equals_rebuild""")),

    // PRODUCT QUANTIZATION ([[graft.ops.Pq]], Jégou et al. 2011): 16
    // floats → 4 codes (16× compression); queries score ASYMMETRICALLY
    // against reconstructions decoded from codes alone — the float
    // corpus column never enters the serving plan. On the clustered
    // fixture PQ is a coarse quantizer (a tight cluster collapses to one
    // code word), so the honest contract is cluster-level: every ADC
    // top-5 neighbor comes from the probe's own planted cluster, and the
    // mean reconstruction error stays an order of magnitude under the
    // inter-cluster spacing. Flags computed from data, oracle emits the
    // literal expected row (q68 pattern) — a quantizer regression
    // hash-fails.
    QueryDef(
      "q171_ann_pq",
      (s, _) => {
        val (corpus, probes, _, _) = clusteredFor(s)
        val model = graft.ops.Pq.train(corpus, "vec_id", "embedding",
          m = 4, k = 32, stride = 62L)
        val encoded = graft.ops.Pq.encode(corpus, "embedding", model)
        val pq = graft.ops.Pq.adcTopK(
          probes, encoded.select(col("vec_id"), col("pq_codes")),
          "vec_id", "embedding", k = 5, model)
        val sameCluster = pq
          .withColumn("q_cluster", ((col("q_id") - 100000L) ).cast("long"))
          .withColumn("n_cluster", (col("neighbor_id") / lit(PerCluster)).cast("long"))
          .agg(
            // MEASURED, not a literal: a regression that drops probes
            // entirely would otherwise stay green (the r12 review's
            // vacuous-pin rule)
            countDistinct(col("q_id")).as("n_probes_measured"),
            avg((col("q_cluster") === col("n_cluster")).cast("double")).as("frac"))
        val mse = encoded
          .select(graft.functions.VectorExprs.dist2_f(
            col("embedding").cast("array<double>"),
            graft.ops.Pq.reconstruct(col("pq_codes"), model)).as("e"))
          .agg(avg(col("e")).as("mse"))
        sameCluster.crossJoin(broadcast(mse))
          .select(
            col("n_probes_measured").cast("long").as("n_probes"),
            (col("frac") === 1.0).as("top5_same_cluster_ok"),
            (col("mse") <= 0.5).as("recon_mse_ok"),
            lit(4).as("codes_per_vec"),
            lit(16).as("compression_x"))
      },
      Some("""
        SELECT CAST(20 AS BIGINT) AS n_probes,
               true AS top5_same_cluster_ok, true AS recon_mse_ok,
               CAST(4 AS INTEGER) AS codes_per_vec,
               CAST(16 AS INTEGER) AS compression_x""")),

    // IVF-PQ ([[graft.ops.Pq.ivfPqQuery]] — the FAISS IVFx,PQy
    // composition): coarse cells prune candidate generation to nProbe
    // cells per query AND the payload inside each cell is PQ codes, so
    // the serving scan reads nProbe cells of an m-bytes-per-vector
    // table. Same routing head as the exact/int8 IVF paths
    // (probeCells), same coarse-quantizer contract as q171: every top-5
    // neighbor from the probe's own planted cluster, hash-gated as
    // literal flags.
    QueryDef(
      "q173_ann_ivf_pq",
      (s, _) => {
        val (corpus, probes, ivfIdx, _) = clusteredFor(s)
        val model = graft.ops.Pq.train(corpus, "vec_id", "embedding",
          m = 4, k = 32, stride = 62L)
        val served = graft.ops.Pq.ivfPqIndex(ivfIdx.assigned, "vec", model)
        val top = graft.ops.Pq.ivfPqQuery(
          probes, ivfIdx.centroids, served, "vec_id", "embedding",
          k = 5, model, nProbe = 4)
        top
          .withColumn("q_cluster", (col("q_id") - 100000L).cast("long"))
          .withColumn("n_cluster", (col("neighbor_id") / lit(PerCluster)).cast("long"))
          .agg(
            count(lit(1)).as("n_results"),
            avg((col("q_cluster") === col("n_cluster")).cast("double")).as("frac"))
          .select(
            col("n_results").cast("long").as("n_results"),
            (col("frac") === 1.0).as("top5_same_cluster_ok"),
            lit(4).as("cells_probed"),
            lit(16).as("cells_total"))
      },
      Some("""
        SELECT CAST(100 AS BIGINT) AS n_results,
               true AS top5_same_cluster_ok,
               CAST(4 AS INTEGER) AS cells_probed,
               CAST(16 AS INTEGER) AS cells_total""")),

    // RESIDUAL IVF-PQ ([[graft.ops.Pq.ivfPqQueryResidual]]): encode each
    // vector's displacement FROM its coarse cell centroid instead of the
    // raw vector — the coarse quantizer explains the between-cluster
    // structure, so the PQ bits buy within-cell precision. Comparative
    // gate: same codes, same cells, and the residual route's
    // reconstruction error must beat the plain route by the measured
    // fixture margin (1.6×; pinned at ≥1.25×) while keeping the
    // same-cluster serving contract.
    QueryDef(
      "q175_ann_ivf_pq_residual",
      (s, _) => {
        val (corpus, probes, ivfIdx, _) = clusteredFor(s)
        import graft.functions.VectorExprs.dist2_f
        import graft.ops.Pq
        // the comparative gate NEEDS both models (plain as the baseline
        // the residual route must beat), but their trainings are
        // independent job chains — overlap them on two driver threads so
        // the second chain's tasks back-fill the first's stragglers
        // (guide §2.6); each training is deterministic on its own
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val plainF = Future(
          Pq.train(corpus, "vec_id", "embedding", m = 4, k = 32, stride = 62L))
        val resF = Future(Pq.trainResiduals(ivfIdx.assigned, ivfIdx.centroids,
          "id", "vec", m = 4, k = 32, stride = 62L))
        val plain = Await.result(plainF, Duration.Inf)
        val res = Await.result(resF, Duration.Inf)
        val msePlain = Pq.encode(corpus, "embedding", plain)
          .select(dist2_f(col("embedding").cast("array<double>"),
            Pq.reconstruct(col("pq_codes"), plain)).as("e"))
          .agg(avg(col("e")).as("mse_plain"))
        val servedR = Pq.ivfPqIndexResidual(ivfIdx.assigned, ivfIdx.centroids, "vec", res)
        val mseRes = ivfIdx.assigned
          .join(servedR, Seq("cell", "id")).join(ivfIdx.centroids, "cell")
          .select(dist2_f(col("vec").cast("array<double>"),
            zip_with(col("centroid").cast("array<double>"),
              Pq.reconstruct(col("pq_codes"), res), (x, y) => x + y)).as("e"))
          .agg(avg(col("e")).as("mse_res"))
        val top = Pq.ivfPqQueryResidual(probes, ivfIdx.centroids, servedR,
          "vec_id", "embedding", k = 5, res, nProbe = 4)
        val frac = top
          .withColumn("q_cluster", (col("q_id") - 100000L).cast("long"))
          .withColumn("n_cluster", (col("neighbor_id") / lit(PerCluster)).cast("long"))
          .agg(
            count(lit(1)).as("n_results"),
            avg((col("q_cluster") === col("n_cluster")).cast("double")).as("frac"))
        frac.crossJoin(broadcast(msePlain)).crossJoin(broadcast(mseRes))
          .select(
            col("n_results").cast("long").as("n_results"),
            (col("frac") === 1.0).as("top5_same_cluster_ok"),
            (col("mse_res") * 1.25 <= col("mse_plain")).as("residual_beats_plain"))
      },
      Some("""
        SELECT CAST(100 AS BIGINT) AS n_results,
               true AS top5_same_cluster_ok,
               true AS residual_beats_plain""")),

    // Vector norms via higher-order fold (functions.aggregate) — the
    // map-side feature-hygiene pass (no shuffle at all).
    QueryDef(
      "q34_embedding_norms",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            round(Similarity.norm(col("embedding")), 4).as("l2_norm"))
          .orderBy(col("vec_id")),
      Some(s"""
        SELECT vec_id, label,
          round(sqrt(${oracleDot.format("embedding", "embedding")}), 4) AS l2_norm
        FROM embeddings ORDER BY vec_id""")),

    // Brute-force exact cosine top-5 for a probe set (vec_id < 5): broadcast
    // probes, map-side score, window top-k — the correctness baseline ANN.
    QueryDef(
      "q35_ann_brute_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.bruteTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q_id, e.vec_id AS neighbor_id,
            CASE WHEN sqrt(${oracleDot.format("q_vec", "q_vec")}) *
                      sqrt(${oracleDot.format("e.embedding", "e.embedding")}) > 0
                 THEN ${oracleDot.format("q_vec", "e.embedding")} /
                      (sqrt(${oracleDot.format("q_vec", "q_vec")}) *
                       sqrt(${oracleDot.format("e.embedding", "e.embedding")}))
                 ELSE -1.0 END AS cos_raw
          FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, neighbor_id, cos_raw,
            row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored)
        SELECT q_id, rank, neighbor_id, round(cos_raw, 4) AS cosine
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // Label centroids — per-class mean vector summary, reduced to a stable
    // scalar (mean of the first component + mean norm) for the oracle.
    QueryDef(
      "q36_label_stats",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n_vectors"),
            min(element_at(col("embedding"), 1).cast("double")).as("min_first_dim"),
            max(element_at(col("embedding"), 1).cast("double")).as("max_first_dim"))
          .orderBy(col("label")),
      Some("""
        SELECT label, count(*) AS n_vectors,
          min(CAST(embedding[1] AS DOUBLE)) AS min_first_dim,
          max(CAST(embedding[1] AS DOUBLE)) AS max_first_dim
        FROM embeddings GROUP BY label ORDER BY label""")),

    // LSH-bucketed approximate NN (the 100 TB path), gated as a planted-NN
    // point lookup: each probe is a perturbed twin of a corpus vector; the
    // rank-1 result must be that vector, with a bit-stable cosine — this
    // exercises sketch → multi-table explode → bucket join → exact rerank
    // end-to-end under a full hash oracle.
    QueryDef(
      "q37_ann_lsh_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopK(planted(e.filter(col("vec_id") < 5)), e,
            "vec_id", "embedding", k = 5)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedCosineSql("WHERE vec_id < 5"))),

    // IVF approximate NN against the stored cell-partitioned index (build
    // amortized offline — see ivfIndexFor): planted probes land in their
    // source's cell; the rank-1 result is exactly predictable.
    QueryDef(
      "q38_ann_ivf_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfQuery(planted(e.filter(col("vec_id") < 5)), ivfIndexFor(s, dir),
            "vec_id", "embedding", k = 5, nProbe = 4)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedCosineSql("WHERE vec_id < 5"))),

    // Embedding-cosine near-dup pairs via shared LSH buckets, on a corpus
    // with one planted near-dup per vector (cosine ≈ 1 ≥ 0.95; i.i.d.
    // cross pairs ≤ ~0.51): the pair list is exactly the planted set, so
    // the bucket-join pipeline carries a full hash oracle.
    QueryDef(
      "q39_embedding_neardup",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val orig = e.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        Similarity.cosineNearDupPairs(orig.unionByName(planted(e)), "vec_id", "embedding",
            threshold = 0.95)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001 + 0.0005)"
        val ov = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        s"""
          WITH p AS (SELECT vec_id, $pv AS pv, $ov AS ov FROM embeddings)
          SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
            round(${oracleDot.format("pv", "ov")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("ov", "ov")})),
              4) AS cosine
          FROM p ORDER BY id_a"""
      }),

    // int8 scalar quantization of the embedding column (the 4× memory /
    // bandwidth lever for a 100 TB vector store) via the native
    // quantize_i8 / quant_err_i8 expressions: per-vector min/max scaling,
    // all-double math, floor(v + 0.5) half-up rounding — bit-identical in
    // any IEEE engine, so codes AND reconstruction errors carry a full
    // hash oracle; recon_ok is the q51-style independently-recomputed
    // half-step-bound flag (literally true everywhere).
    QueryDef(
      "q81_embedding_quantize",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            array_min(col("embedding")).cast("double").as("mn"),
            array_max(col("embedding")).cast("double").as("mx"),
            // serialized for the hash gate (the q04 pattern: the oracle
            // harness can't sort/hash raw array columns)
            array_join(graft.functions.QuantExprs.quantize_i8(col("embedding")), ",")
              .as("codes"),
            graft.functions.QuantExprs.quant_err_i8(col("embedding")).as("max_err"))
          .withColumn("recon_ok",
            col("max_err") <= (col("mx") - col("mn")) / lit(255.0) / lit(2.0) + lit(1e-12))
          .orderBy(col("vec_id")),
      Some("""
        WITH base AS (
          SELECT vec_id,
            CAST(list_min(embedding) AS DOUBLE) AS mn,
            CAST(list_max(embedding) AS DOUBLE) AS mx,
            embedding
          FROM embeddings),
        qz AS (
          SELECT vec_id, mn, mx,
            CASE WHEN mx = mn THEN list_transform(embedding, x -> 0)
                 ELSE list_transform(embedding, x ->
                   CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INTEGER))
            END AS codes,
            CASE WHEN mx = mn THEN 0.0
                 ELSE list_max(list_transform(embedding, x ->
                   abs(CAST(x AS DOUBLE) -
                       (mn + floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5)
                             * (mx - mn) / 255.0))))
            END AS max_err
          FROM base)
        SELECT vec_id, mn, mx, array_to_string(codes, ',') AS codes, max_err,
          max_err <= (mx - mn) / 255.0 / 2.0 + 1e-12 AS recon_ok
        FROM qz ORDER BY vec_id""")),

    // IVF ANN over the QUANTIZED index: candidate scoring runs cosine_q8
    // straight off the int8 code column (the float vector is pruned from
    // the scan — PlanSpec pins ReadSchema), dequantizing inline. Planted
    // probes still rank their source first (quantization shifts cosines by
    // ≤ half a step; planted ≈ 1 vs cross pairs ≤ ~0.51), and the quantized
    // cosine itself is bit-stable all-double math, so the DuckDB twin
    // recomputes codes + dequant + fold closed-form → full hash oracle.
    QueryDef(
      "q82_ann_ivf_quantized",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfQueryQuantized(planted(e.filter(col("vec_id") < 5)),
            ivfQuantIndexFor(s, dir), "vec_id", "embedding", k = 5, nProbe = 4)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedQuantNnSql)),

    // The SAME planted-NN answer via the quantized LSH route: buckets were
    // precomputed at index-build time from the dequantized codes (a pure
    // function of the stored codes — the online path reads no floats), and
    // candidates are scored with cosine_q8 off the code column. Oracle =
    // q82's VERBATIM (two physical routes, one answer — the q45/q67 and
    // q78/q85 pattern, now for the quantized ANN surface).
    QueryDef(
      "q88_ann_lsh_quantized",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopKQuantized(planted(e.filter(col("vec_id") < 5)),
            lshQuantIndexFor(s, dir), "vec_id", "embedding", k = 5)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedQuantNnSql)),

    // KNN SELF-JOIN (corpus-wide near-neighbor graph): every row of
    // orig ∪ planted finds its LSH-bucketed top-1 from the SAME table — no
    // broadcastable probe set, the bulk form of ANN. On the planted corpus
    // the answer is closed-form: each row's top-1 is its twin (cosine ≈ 1
    // collides in every table; i.i.d. cross pairs ≤ ~0.51), and the fused
    // cosine kernel is argument-symmetric, so both directions carry the
    // same rounded value.
    QueryDef(
      "q97_ann_knn_join",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val orig = e.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        Similarity.knnJoinLsh(orig.unionByName(planted(e)), "vec_id", "embedding", k = 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some {
        val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001 + 0.0005)"
        val ov = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        s"""
          WITH p AS (SELECT vec_id, $pv AS pv, $ov AS ov FROM embeddings),
          cos AS (
            SELECT vec_id,
              round(${oracleDot.format("pv", "ov")} /
                (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("ov", "ov")})),
                4) AS cosine
            FROM p)
          SELECT vec_id AS q_id, vec_id + 100000 AS neighbor_id, cosine FROM cos
          UNION ALL
          SELECT vec_id + 100000 AS q_id, vec_id AS neighbor_id, cosine FROM cos
          ORDER BY q_id"""
      }),

    // Embedding dedup CLUSTERS: the q39 near-dup pairs fed through the
    // SAME connected-components operator the text battery uses (q78) —
    // the embedding-side end-to-end dedup composition. On the planted
    // corpus every component is exactly {i, i+100000} with min-label i,
    // so the oracle is closed-form from the construction.
    QueryDef(
      "q98_embedding_dedup_clusters",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val orig = e.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        val pairs = Similarity.cosineNearDupPairs(
            orig.unionByName(planted(e)), "vec_id", "embedding", threshold = 0.95)
          .select(col("id_a"), col("id_b"))
        graft.ops.Dedup.connectedComponents(pairs)
          .select(col("id").as("vec_id"), col("component"))
          .orderBy(col("vec_id"))
      },
      Some("""
        SELECT vec_id, vec_id AS component FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id, vec_id AS component FROM embeddings
        ORDER BY vec_id""")),

    // Deterministic distributed k-means (Lloyd's) — the SemDeDup-style
    // semantic partitioner ([[graft.ops.Clustering]]): explicit stride
    // init (one seed per true cluster on this fixture), 3 rounds of
    // map-side argmin assignment + one (cluster, dim)-keyed partial-sum
    // aggregate. On the separated fixture the final assignment is
    // closed-form (cluster = vec_id / 100), so the gate hashes per-cluster
    // sizes, an exact-membership flag, and convergence (last-round
    // centroid shift ≈ 0 once assignments stabilize) — the q68-style
    // literal-row oracle.
    QueryDef(
      "q101_kmeans_clusters",
      (s, _) => {
        val (corpus, _, _, _) = clusteredFor(s)
        val init = graft.ops.Clustering.strideInit(
          corpus, "vec_id", "embedding", k = NClusters, stride = PerCluster)
        val model = graft.ops.Clustering.lloyd(corpus, "embedding", init, iters = 3)
        graft.ops.Clustering.assignClusters(corpus, "embedding", model.centroids)
          .groupBy(col("cluster"))
          .agg(
            count(lit(1)).as("n_points"),
            (min(when(col("cluster") === (col("vec_id") / lit(PerCluster))
              .cast("int"), 1).otherwise(0)) === 1).as("members_ok"))
          .withColumn("shift_ok", lit(model.lastShift < 1e-6))
          .orderBy(col("cluster"))
      },
      Some("""
        SELECT CAST(g AS INTEGER) AS cluster, CAST(100 AS BIGINT) AS n_points,
               true AS members_ok, true AS shift_ok
        FROM generate_series(0, 19) t(g) ORDER BY cluster""")),

    // SemDeDup end-to-end (Abbas et al. 2023): k-means partition, then
    // near-dup drop WITHIN clusters only — the cluster-key equi-join
    // replaces any corpus-wide candidate structure. Gate: the clustered
    // fixture ∪ planted twins; twins land in their source's cluster
    // (perturbation ≲ 0.02 vs inter-cluster margins ≫ 1) and are the
    // ONLY pairs under the 0.05 L2 radius (same-cluster non-twins sit at
    // ~0.28), so the full labeling is closed-form: originals keep,
    // twins drop, cluster = (id mod 100000) / 100.
    QueryDef(
      "q108_semdedup",
      (s, _) => {
        val (corpus, _, _, _) = clusteredFor(s)
        val orig = corpus.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        val union = orig.unionByName(planted(corpus))
        val init = graft.ops.Clustering.strideInit(
          corpus, "vec_id", "embedding", k = NClusters, stride = PerCluster)
        val model = graft.ops.Clustering.lloyd(union, "embedding", init, iters = 2)
        graft.ops.Clustering.semanticKeepers(union, "vec_id", "embedding",
            model.centroids, maxDist = 0.05)
          .orderBy(col("vec_id"))
      },
      Some("""
        WITH ids AS (
          SELECT g AS vec_id FROM generate_series(0, 1999) t(g)
          UNION ALL
          SELECT g + 100000 FROM generate_series(0, 1999) t(g))
        SELECT vec_id,
          CAST(floor((vec_id % 100000) / 100) AS INTEGER) AS cluster,
          vec_id < 100000 AS keep
        FROM ids ORDER BY vec_id""")),

    // INCREMENTAL IVF index maintenance (the q92/q107 rule on the ANN
    // surface): planted twins are routed into the EXISTING stored index
    // against the stored codebook — no retraining, no rebuild, O(batch)
    // cost — and the gate queries the appended index: each original's
    // nearest non-self neighbor must be its appended twin (cosine ≈ 1 vs
    // i.i.d. ≤ ~0.51; ivfQuery excludes self). Twins are stored as FLOAT
    // like the base corpus, and the oracle replays the double→float→double
    // round-trip exactly (IEEE-correct in both engines).
    QueryDef(
      "q115_ann_ivf_append",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = ivfAppendedFor(s, dir)
        Similarity.ivfQuery(e.filter(col("vec_id") < 5), idx,
            "vec_id", "embedding", k = 5, nProbe = 4)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some {
        val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        val tv = "list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) * 1.001 + 0.0005 AS FLOAT) AS DOUBLE))"
        s"""
          WITH p AS (
            SELECT vec_id, $pv AS pv, $tv AS tv
            FROM embeddings WHERE vec_id < 5)
          SELECT vec_id AS q_id, vec_id + 100000 AS neighbor_id,
            round(${oracleDot.format("pv", "tv")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("tv", "tv")})),
              4) AS cosine
          FROM p ORDER BY q_id"""
      }),

    // q115's QUANTIZED sibling: the twins are appended with int8 codes +
    // corners computed exactly as the offline quantized write computes
    // them, and the gate queries via the quantized route (cosine_q8 off
    // the code column — the scan never touches the appended floats). The
    // oracle replays float round-trip → corners → codes → dequant → fold
    // closed-form (the q82 formula over the float-rounded twin).
    QueryDef(
      "q116_ann_ivf_append_quantized",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = ivfAppendedQuantFor(s, dir)
        Similarity.ivfQueryQuantized(e.filter(col("vec_id") < 5), idx,
            "vec_id", "embedding", k = 5, nProbe = 4)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedAppendQuantNnSql)),

    // The SAME appended-twin answer via the quantized LSH route
    // (appendLshIndexQuantized): twins are signed + quantized exactly as
    // the offline LSH build and appended O(batch); the original probes
    // collide with their twins' stored buckets (same direction → same
    // sign bits) and rank them first off the code column. Oracle = q116's
    // VERBATIM — two incremental index routes, one answer (the q82/q88
    // pattern on the append surface). Design contrast carried in the
    // operator doc: LSH appends never need q117's recall-triggered
    // rebuild — the bucket hash is data-independent, so a from-scratch
    // rebuild would assign identical buckets; only the LEARNED IVF
    // codebook drifts.
    QueryDef(
      "q122_ann_lsh_append_quantized",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopKQuantized(e.filter(col("vec_id") < 5),
            lshAppendedFor(s, dir), "vec_id", "embedding", k = 5)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"))
      },
      Some(plantedAppendQuantNnSql)),

    // RECALL-TRIGGERED IVF REBUILD — the maintenance half of incremental
    // ANN (q115/q116 are the append half; VERDICT r7 missing #2): the
    // drift fixture appends a batch from an embedding region orthogonal
    // to the frozen codebook, probe recall@5 vs brute drops to ~0.4
    // (< 0.8 bar, closed-form by the fixture's construction — see
    // driftFixture), maintainIvfIndex detects it, rebuilds the codebook
    // on the grown corpus, and the re-probe restores recall ≈ 1.0. The
    // oracle emits the literal expected maintenance outcome (the q68
    // recall-flag pattern): a fixture that fails to degrade, a probe
    // that fails to detect, or a rebuild that fails to repair each
    // hash-fail the gate.
    QueryDef(
      "q117_ann_ivf_rebuild",
      (s, _) => {
        import s.implicits._
        val m = driftMaintFor(s, quantized = false)
        Seq((DriftClusters.toLong, m.recallBefore < 0.8, m.rebuilt,
          m.recallAfter >= 0.8))
          .toDF("n_probes", "recall_before_low", "rebuilt", "recall_after_ok")
      },
      Some(s"""
        SELECT CAST($DriftClusters AS BIGINT) AS n_probes,
               true AS recall_before_low, true AS rebuilt,
               true AS recall_after_ok""")),

    // q117's QUANTIZED sibling: the drifted batch is appended with int8
    // codes against the frozen codebook, recall is probed through the
    // quantized query route (cosine_q8 off the code column), and the
    // rebuild rewrites the quantized layout (fresh codes + corners) —
    // the full maintenance cycle for the 4×-bandwidth index.
    QueryDef(
      "q118_ann_ivf_rebuild_quantized",
      (s, _) => {
        import s.implicits._
        val m = driftMaintFor(s, quantized = true)
        Seq((DriftClusters.toLong, m.recallBefore < 0.8, m.rebuilt,
          m.recallAfter >= 0.8))
          .toDF("n_probes", "recall_before_low", "rebuilt", "recall_after_ok")
      },
      Some(s"""
        SELECT CAST($DriftClusters AS BIGINT) AS n_probes,
               true AS recall_before_low, true AS rebuilt,
               true AS recall_after_ok""")),

    // CDC → ANN INDEX SYNC (r13 — [[graft.ops.IndexSync.syncIvfIndex]]:
    // the last derived-index family wired into the changelog loop): the
    // embedding corpus lives in a generational store table; three commits
    // drive INSERT (planted twins of ids 0–4, re-keyed +100000), UPDATE
    // (100003's vector replaced by a twin of id 4's base), and DELETE
    // (100004) through upsert → changelog → versioned append + tombstone.
    // The synced query route must rank each original's twin first with the
    // exact float-round-trip cosine (q115's arithmetic), serve the UPDATED
    // 100003 as id 4's nearest, and the flags pin the negative space: the
    // deleted id appears in no one's top-5, and nothing near-identical
    // remains for id 3 (its old twin's vector was superseded).
    QueryDef(
      "q196_cdc_ann_sync",
      (s, dir) => {
        import graft.ops.IndexSync
        import graft.sources.Store
        val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val path = java.nio.file.Files.createTempDirectory("q196idx").toString
        Similarity.writeIvfIndex(
          Similarity.buildIvfIndex(e, "vec_id", "embedding"), path)
        val table = "cdc_ann_docs"
        Store.bulkWrite(e, table, "vec_id", buckets = 4, parts = 8,
          validateKeys = true)
        def twinVec =
          transform(col("embedding"),
            x => (x.cast("double") * 1.001 + 0.0005).cast("float"))
        def applyLatest(): Unit = {
          val v = Store.versions(s, table)
          IndexSync.syncIvfIndex(s,
            Store.changes(s, table, v.head, v.last), path, "vec_id", "embedding")
        }
        // commit A: insert the five twins
        Store.upsert(s, table,
          e.filter(col("vec_id") < 5)
            .select((col("vec_id") + 100000L).as("vec_id"), twinVec.as("embedding")),
          "vec_id", buckets = 4)
        applyLatest()
        // commit B: 100003 becomes a twin of id 4's base
        Store.upsert(s, table,
          e.filter(col("vec_id") === 4L)
            .select(lit(100003L).as("vec_id"), twinVec.as("embedding")),
          "vec_id", buckets = 4)
        applyLatest()
        // commit C: 100004 is erased
        Store.delete(s, table,
          s.range(1).select(lit(100004L).as("vec_id")), "vec_id", buckets = 4)
        applyLatest()
        val q = e.filter(col("vec_id") <= 4L)
        val top = Similarity.ivfQuerySynced(s, path, q, "vec_id", "embedding",
            k = 5, nProbe = 4)
          .localCheckpoint()
        graft.queries.EventOps.rmTree(path)
        val flags = top.agg(
          (sum(when(col("neighbor_id") === 100004L, 1L).otherwise(0L)) === 0L)
            .as("deleted_absent"),
          (sum(when(col("q_id") === 3L && col("cosine") > 0.99, 1L).otherwise(0L)) === 0L)
            .as("stale_absent"))
        top.filter(col("rank") === 1 && col("q_id") =!= 3L)
          .crossJoin(broadcast(flags))
          .select(col("q_id"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"),
            col("deleted_absent"), col("stale_absent"))
          .orderBy(col("q_id"))
      },
      Some {
        val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        val tv = "list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) * 1.001 + 0.0005 AS FLOAT) AS DOUBLE))"
        s"""
          WITH p AS (
            SELECT vec_id, $pv AS pv, $tv AS tv
            FROM embeddings WHERE vec_id IN (0, 1, 2, 4))
          SELECT vec_id AS q_id,
            CASE WHEN vec_id = 4 THEN 100003 ELSE vec_id + 100000 END AS neighbor_id,
            round(${oracleDot.format("pv", "tv")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("tv", "tv")})),
              4) AS cosine,
            true AS deleted_absent, true AS stale_absent
          FROM p ORDER BY q_id"""
      }),

    // STREAMING ANN INDEX SYNC (r15 — VERDICT r14 #1d, the q194 pattern
    // over the IVF surface): the embedding corpus streams through
    // `toStoreUpsertWithIndexSync(ivfIndexPath=…)` as 4 ordered batches —
    // originals, twin INSERTS (ids 0–4 re-keyed +100000), a cross-batch
    // UPDATE (100003 becomes a twin of id 4's base), and a VALUE-IDENTICAL
    // re-upsert of 100001 (whose changelog diffs empty: the no-op sync
    // path, no version burned) — with compactEvery=2 so a maintenance
    // fold runs mid-stream and the `_corpus-v` marker must advance across
    // the compaction commit (ADVICE r15) or batch 3 would silently
    // rebuild. A DELETE (100004) lands out of band after the drain via
    // the batch CDC apply. The synced index must (a) answer the planted
    // top-1s with the exact float-round-trip cosine, (b) serve neither
    // the deleted id nor the superseded twin, and (c) answer EXACTLY as
    // a from-scratch `buildIvfIndex` over the final table state — all
    // cells probed, so both routes are exact over their resolved vector
    // sets and `matches_rebuild` pins set equality for any batch split.
    QueryDef(
      "q197_stream_ann_sync",
      (s, dir) => {
        import graft.ops.{IndexSync, Similarity}
        import graft.sources.Store
        val ss = EventOps.streamSession(s)
        val e = Tables.embeddings(ss, dir).select(col("vec_id"), col("embedding"))
        def twinOf(src: org.apache.spark.sql.DataFrame,
            newId: org.apache.spark.sql.Column) =
          src.select(newId.as("vec_id"),
            transform(col("embedding"),
              x => (x.cast("double") * 1.001 + 0.0005).cast("float")).as("embedding"))
        val frame = e.withColumn("__b", lit(0L))
          .unionByName(twinOf(e.filter(col("vec_id") < 5), col("vec_id") + 100000L)
            .withColumn("__b", lit(1L)))
          .unionByName(twinOf(e.filter(col("vec_id") === 4L), lit(100003L))
            .withColumn("__b", lit(2L)))
          .unionByName(twinOf(e.filter(col("vec_id") === 1L), lit(100001L))
            .withColumn("__b", lit(3L)))
        val srcDir = EventOps.cachedSrcDir("q197", dir)(
          EventOps.stageOrderedBatches(frame, col("__b"), 4, "q197"))
        val table = "sann_docs"
        ss.sql(s"DROP TABLE IF EXISTS $table")
        val idxRoot = java.nio.file.Files.createTempDirectory("q197idx").toString
        val path = s"$idxRoot/idx"
        val ckpt = java.nio.file.Files.createTempDirectory("q197ckpt").toString
        val stream = ss.readStream.schema(e.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val q = graft.streaming.EventStream.toStoreUpsertWithIndexSync(
          stream, table, "vec_id", "text",
          checkpointLocation = Some(ckpt), compactEvery = 2,
          ivfIndexPath = Some(path), nCentroids = 16)
        try q.processAllAvailable()
        finally q.stop()
        // the delete composes out of band: stream surface is upsert-only
        val v0 = Store.versions(s, table).last
        Store.delete(s, table,
          s.range(1).select(lit(100004L).as("vec_id")), "vec_id", buckets = 4)
        val v1 = Store.versions(s, table).last
        IndexSync.syncIvfIndex(s,
          Store.changes(s, table, v0, v1), path, "vec_id", "embedding")
        Similarity.markIvfCorpusSynced(s, path, v1)
        val probes = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding")).filter(col("vec_id") <= 4L)
        val top = Similarity.ivfQuerySynced(s, path, probes, "vec_id", "embedding",
            k = 5, nProbe = 16)
          .localCheckpoint()
        val fin = Store.read(s, table).select(col("vec_id"), col("embedding"))
        val fresh = Similarity.ivfQuery(probes,
          Similarity.buildIvfIndex(fin, "vec_id", "embedding"),
          "vec_id", "embedding", k = 5, nProbe = 16)
        val matches = top.exceptAll(fresh).isEmpty && fresh.exceptAll(top).isEmpty
        s.sql(s"DROP TABLE IF EXISTS $table")
        Seq(ckpt, idxRoot).foreach(graft.queries.EventOps.rmTree)
        val flags = top.agg(
          (sum(when(col("neighbor_id") === 100004L, 1L).otherwise(0L)) === 0L)
            .as("deleted_absent"),
          (sum(when(col("q_id") === 3L && col("cosine") > 0.99, 1L).otherwise(0L)) === 0L)
            .as("stale_absent"))
        top.filter(col("rank") === 1 && col("q_id") =!= 3L)
          .crossJoin(broadcast(flags))
          .select(col("q_id"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"),
            col("deleted_absent"), col("stale_absent"),
            lit(matches).as("matches_rebuild"))
          .orderBy(col("q_id"))
      },
      Some {
        val pv = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        val tv = "list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) * 1.001 + 0.0005 AS FLOAT) AS DOUBLE))"
        s"""
          WITH p AS (
            SELECT vec_id, $pv AS pv, $tv AS tv
            FROM embeddings WHERE vec_id IN (0, 1, 2, 4))
          SELECT vec_id AS q_id,
            CASE WHEN vec_id = 4 THEN 100003 ELSE vec_id + 100000 END AS neighbor_id,
            round(${oracleDot.format("pv", "tv")} /
              (sqrt(${oracleDot.format("pv", "pv")}) * sqrt(${oracleDot.format("tv", "tv")})),
              4) AS cosine,
            true AS deleted_absent, true AS stale_absent,
            true AS matches_rebuild
          FROM p ORDER BY q_id"""
      }),
  )

  /** Drift fixture for the recall-triggered rebuild gates (q117/q118):
    * the BASE corpus lives in dims 0–7 (10 tight clusters, zeros in
    * 8–15), the DRIFTED append batch lives in dims 8–15 — a new embedding
    * region the frozen 10-cell codebook knows nothing about. Every
    * drifted vector's cosine against every base centroid is noise-driven
    * (the structured halves are orthogonal), so cell assignment SCATTERS
    * each drifted cluster across cells, and a drifted probe's nProbe=4 of
    * 10 cells hold only ~0.4 of its true neighbors — recall fails the
    * 0.8 bar by construction. Rebuilding the codebook on the grown corpus
    * restores cluster-per-cell structure (the q68 shape: 16 centroids
    * over 20 clusters, measured recall ≈ 1.0). Deterministic: fixed-seed
    * driver RNG, fixed generation order.
    */
  private lazy val driftFixture: (Seq[(Long, Seq[Float])], Seq[(Long, Seq[Float])],
      Seq[(Long, Seq[Float])]) = {
    val rnd = new scala.util.Random(0xD21F7F1EL)
    def center(live: Range): Array[Double] =
      Array.tabulate(DriftDim)(i => if (live.contains(i)) rnd.nextGaussian() else 0.0)
    def point(c: Array[Double]): Seq[Float] =
      Array.tabulate(DriftDim)(i => (c(i) + rnd.nextGaussian() * 0.05).toFloat).toSeq
    val baseCenters = Seq.fill(DriftClusters)(center(0 until 8))
    val driftCenters = Seq.fill(DriftClusters)(center(8 until 16))
    val base = for {
      (c, ci) <- baseCenters.zipWithIndex; p <- 0 until DriftPerCluster
    } yield ((ci * DriftPerCluster + p).toLong, point(c))
    val drift = for {
      (c, ci) <- driftCenters.zipWithIndex; p <- 0 until DriftPerCluster
    } yield ((1000 + ci * DriftPerCluster + p).toLong, point(c))
    val probes = driftCenters.zipWithIndex.map { case (c, ci) =>
      (200000L + ci, point(c))
    }
    (base, drift, probes)
  }

  private val driftCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfMaintenance]

  private def driftMaintFor(
      s: org.apache.spark.sql.SparkSession, quantized: Boolean): Similarity.IvfMaintenance =
    driftCache.getOrElseUpdate(if (quantized) "q" else "f", {
      import s.implicits._
      val (baseRows, driftRows, probeRows) = driftFixture
      val base = baseRows.toDF("vec_id", "embedding")
      val drift = driftRows.toDF("vec_id", "embedding")
      val probes = probeRows.toDF("vec_id", "embedding")
      val path = s"${procRoot}_drift" + (if (quantized) "q" else "")
      val idx = Similarity.buildIvfIndex(base, "vec_id", "embedding",
        nCentroids = DriftClusters, seed = 42L)
      if (quantized) {
        Similarity.writeIvfIndexQuantized(idx, path)
        Similarity.appendIvfIndexQuantized(s, path, drift, "vec_id", "embedding")
      } else {
        Similarity.writeIvfIndex(idx, path)
        Similarity.appendIvfIndex(s, path, drift, "vec_id", "embedding")
      }
      Similarity.maintainIvfIndex(s, path, probes, "vec_id", "embedding",
        k = 5, nProbe = 4, recallBar = 0.8, nCentroids = 16, seed = 42L,
        quantized = quantized)
    })

  /** q115's appended index: base index built offline from the corpus, then
    * the planted twins routed in INCREMENTALLY against the stored codebook
    * (stored as float, like the base corpus). Built once per (JVM, sfDir).
    */
  private val ivfAppendCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]

  private def ivfAppendedFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    ivfAppendCache.getOrElseUpdate(dir, {
      val path = s"${procRoot}_app/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val e = Tables.embeddings(s, dir)
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(e, "vec_id", "embedding", nCentroids = 16, seed = 42L),
        path)
      Similarity.appendIvfIndex(s, path,
        planted(e).select(col("vec_id"),
          transform(col("embedding"), _.cast("float")).as("embedding")),
        "vec_id", "embedding")
      Similarity.readIvfIndex(s, path)
    })

  /** q116's QUANTIZED appended index — same construction, quantized write
    * + quantized append, for the 4×-bandwidth query route.
    */
  private val ivfAppendQuantCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]

  private def ivfAppendedQuantFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    ivfAppendQuantCache.getOrElseUpdate(dir, {
      val path = s"${procRoot}_appq/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val e = Tables.embeddings(s, dir)
      Similarity.writeIvfIndexQuantized(
        Similarity.buildIvfIndex(e, "vec_id", "embedding", nCentroids = 16, seed = 42L),
        path)
      Similarity.appendIvfIndexQuantized(s, path,
        planted(e).select(col("vec_id"),
          transform(col("embedding"), _.cast("float")).as("embedding")),
        "vec_id", "embedding")
      Similarity.readIvfIndex(s, path)
    })
}
