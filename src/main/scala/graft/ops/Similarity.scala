package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, same API:
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set,
  *    score every target row map-side, per-query top-k via window. Correct
  *    baseline; cost O(|targets| × |queries|) but NO shuffle of the target
  *    table (only the tiny scored projection shuffles for the window).
  *  - [[lshTopK]]: random-hyperplane LSH — bucket both sides by sign-bit
  *    sketch, join on bucket, score only within buckets. The 100 TB path:
  *    comparisons scale with bucket collision volume, not |targets|.
  *
  * All arithmetic is done in double with a left-to-right fold so the DuckDB
  * oracle (list_transform + list_sum over the same element order) produces
  * bit-identical results.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as an exact left-to-right double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ with the same fold shape as [[dot]]. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k of `targets` for each row of `queries`.
    * Output: (q_id, rank, neighbor_id, cosine). Self-matches excluded.
    * `queries` must be small — it is broadcast (at scale: a batch of user
    * queries or probe vectors, never the corpus).
    */
  def bruteTopK(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val t = targets.select(col(idCol).as("neighbor_id"), col(vecCol).as("t_vec"))
    val scored = q
      .join(t, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("t_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Sign-bit sketch under `nPlanes` fixed pseudo-random hyperplanes. The
    * plane coefficient for (plane, element) is derived on the fly from
    * xxhash64 — deterministic across executors with no matrix to ship, and
    * the whole sketch stays a compact fold (a giant unrolled per-element
    * expression breaks janino codegen and falls back to interpreted eval —
    * measured 30× slower).
    */
  def hyperplaneSketch(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) =>
          x.cast("double") *
            (xxhash64(lit(seed + p), i).cast("double") / lit(Long.MaxValue.toDouble))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** LSH-bucketed approximate top-k: join queries and targets on their
    * hyperplane bucket (optionally multi-probe over `nTables` independent
    * sketches), score only bucket collisions, then per-query top-k.
    * Recall < 1.0 by construction; rerank on the exact cosine.
    */
  def lshTopK(
      queries: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val tables = (0 until nTables).map { tIdx =>
        struct(lit(tIdx).as("t_idx"),
          hyperplaneSketch(col(vec), dim, nPlanes, seed = 42L + tIdx * 7919L).as("bucket"))
      }
      df.select(col(id), col(vec), explode(array(tables: _*)).as("b"))
        .select(col(id), col(vec), col("b.t_idx"), col("b.bucket"))
    }
    val q = broadcast(withBuckets(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")), "q_id", "q_vec"))
    val t = withBuckets(
      targets.select(col(idCol).as("neighbor_id"), col(vecCol).as("t_vec")),
      "neighbor_id", "t_vec")
    val scored = q.as("q")
      .join(t.as("t"),
        col("q.t_idx") === col("t.t_idx") && col("q.bucket") === col("t.bucket") &&
          col("q.q_id") =!= col("t.neighbor_id"))
      .select(col("q.q_id").as("q_id"), col("t.neighbor_id").as("neighbor_id"),
        cosine(col("q.q_vec"), col("t.t_vec")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
