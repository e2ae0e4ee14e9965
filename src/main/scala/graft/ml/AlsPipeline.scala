package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1/M2/W1/U2: collaborative-filtering pipeline
  * (reference: `/root/reference/src/model.py:10-15`).
  *
  * Hyperparameters match the reference (maxIter=10, regParam=0.01, defaults
  * otherwise → rank=10, explicit feedback) with ONE documented deviation:
  * `coldStartStrategy("drop")` where the reference runs the default `"nan"`
  * (`model.py:10`). The choice is invisible to every gated query
  * (`recommendForAllUsers` never consults it; [[rmse]] needs drop so NaN
  * predictions for unseen users don't poison the metric) but a caller of
  * `model.transform` on out-of-training users gets dropped rows here vs
  * NaN rows there. ALS is nondeterministic across partitionings, so tests
  * assert shape/bounds — plus a closed-form rank-1 fixture for VALUES
  * (AlsSpec) — never hashes (SURVEY §7.5.4).
  */
object AlsPipeline {

  def train(
      ratings: DataFrame,
      maxIter: Int = 10,
      regParam: Double = 0.01,
      seed: Long = 42L,
      rank: Int = 10): ALSModel =
    new ALS()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setRank(rank)
      .setUserCol("userId")
      .setItemCol("movieId")
      .setRatingCol("rating")
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** M2 + U2: top-k per user, exploded to flat
    * (userId, movieId, predicted_rating) rows (`model.py:13-15`).
    * `recommendForAllUsers` runs MLlib's blocked factor cross-product with
    * internal per-user top-k — the distributed W1 path.
    */
  def recommendAll(model: ALSModel, k: Int = 10): DataFrame =
    model
      .recommendForAllUsers(k)
      .select(col("userId"), explode(col("recommendations")).as("rec"))
      .select(col("userId"), col("rec.movieId").as("movieId"),
        col("rec.rating").cast("float").as("predicted_rating"))

  /** M2's ITEM-side sibling (VERDICT r11 next #7; the reference stops at
    * `recommendForAllUsers`, `model.py:13` — but the serving store takes
    * either orientation unchanged): top-k USERS per movie, exploded to
    * flat (movieId, userId, predicted_rating) rows — the audience-targeting
    * read path ("who should we show this movie to"), same blocked
    * factor cross-product with internal per-item top-k.
    */
  def recommendAllItems(model: ALSModel, k: Int = 10): DataFrame =
    model
      .recommendForAllItems(k)
      .select(col("movieId"), explode(col("recommendations")).as("rec"))
      .select(col("movieId"), col("rec.userId").as("userId"),
        col("rec.rating").cast("float").as("predicted_rating"))

  /** ITEM-ITEM SIMILARITY from the trained factors: top-k nearest items
    * per item by cosine over the ALS item-factor vectors — the
    * "more like this" serving table, derived from the SAME model the
    * user recommendations come from (no separate training). Delegates to
    * [[graft.ops.Similarity.bruteTopK]] (native fused cosine kernel,
    * deterministic neighbor-id tie-break): the factor matrix is
    * items×rank floats — broadcastable for catalog-sized item sets; a
    * catalog past broadcast size switches the same frame to
    * [[graft.ops.Similarity.lshTopK]] or an IVF index unchanged.
    * Factor VALUES are still ALS-nondeterministic — gates assert
    * shape/bounds, AlsSpec pins values on a closed-form fixture.
    */
  def itemSimilarity(model: ALSModel, k: Int = 10): DataFrame =
    graft.ops.Similarity.bruteTopK(
        model.itemFactors, model.itemFactors, "id", "features", k)
      .select(col("q_id").as("movieId"), col("rank"),
        col("neighbor_id").as("similar_movieId"), col("cosine"))

  /** Held-out RMSE (not in the reference; used by the seeded smoke test). */
  def rmse(model: ALSModel, holdout: DataFrame): Double =
    new RegressionEvaluator()
      .setMetricName("rmse")
      .setLabelCol("rating")
      .setPredictionCol("prediction")
      .evaluate(model.transform(holdout).na.drop(Seq("prediction")))
}
