package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Similarity

/** Embedding / similarity-search battery over `embeddings` (array<float>,
  * dim 64). Dot products are left-to-right double folds on both engines so
  * the oracle is bit-stable (see [[graft.ops.Similarity]]).
  */
object VectorOps {

  private val oracleDot =
    "list_sum(list_transform(generate_series(1, 64), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  val defs: Seq[QueryDef] = Seq(

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

    // LSH-bucketed approximate NN (the 100 TB path) — recall is data-
    // dependent → rows-only; quality pinned against brute force in ScalaTest.
    QueryDef(
      "q37_ann_lsh_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),

    // IVF approximate NN: k-means coarse cells + nProbe probing.
    QueryDef(
      "q38_ann_ivf_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
            k = 5, nCentroids = 16, nProbe = 4)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),

    // Embedding-cosine near-dup pairs via shared LSH buckets. The synthetic
    // embeddings are i.i.d. (max pairwise cosine ≈ 0.51), so the threshold
    // is set to surface the top tail; real corpora would use ≥0.95.
    QueryDef(
      "q39_embedding_neardup",
      (s, dir) =>
        Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
            threshold = 0.4)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
          .orderBy(col("id_a"), col("id_b")),
      None),
  )
}
