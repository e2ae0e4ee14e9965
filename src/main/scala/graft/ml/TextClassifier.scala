package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned text classifier for corpus curation — the "quality classifier"
  * stage of CCNet / GPT-3-style pipelines (train a linear model to
  * distinguish a curated reference slice from raw crawl, then keep/weight
  * documents by its score). The heuristic scorers
  * ([[graft.ops.TextStats.qualityScore]]) and the exact-arithmetic
  * affinity ([[graft.ops.Training.targetAffinity]]) are rule-based; this
  * is the LEARNED sibling for when labeled (or proxy-labeled) data exists.
  *
  * Featurization is the scan-local native `hash_embed` expression (signed
  * feature hashing, Weinberger et al. 2009): no vocabulary artifact, no
  * tokenizer shuffle — each document becomes a dim-wide integer count
  * vector inside its scan task, so TRAINING is one MLlib logistic
  * regression over (features, label) rows and SCORING is a map-only pass
  * (the coefficient vector broadcasts inside the plan; nothing shuffles).
  *
  * Scale shape: L-BFGS iterations aggregate gradients tree-wise
  * (`treeAggregate` — map-side partial gradients, O(dim) per partition to
  * the driver); scoring never moves data. Float caveat, stated: gradient
  * sums reduce in partition order, so coefficients are deterministic only
  * to ~ulp across different partitionings — gates assert ACCURACY flags,
  * never coefficient bits (the ALS seeded-RMSE-bound pattern).
  */
object TextClassifier {

  /** The hash-embedded feature vector (MLlib `Vector`) for a text column. */
  def features(textCol: Column, dim: Int): Column =
    array_to_vector(
      transform(graft.functions.HashEmbedExpr.hash_embed(textCol, lit(dim)),
        _.cast("double")))

  /** Fit a logistic regression on `docs(textCol, labelCol)`; labels are
    * 0/1. Deterministic init (MLlib LR starts from zeros), bounded
    * iterations.
    */
  def train(
      docs: DataFrame, textCol: String, labelCol: String, dim: Int = 64,
      maxIter: Int = 50, regParam: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .fit(docs.select(
        features(col(textCol), dim).as("features"),
        col(labelCol).cast("double").as("label")))

  /** Score a corpus: adds `prediction` (0/1). Map-only — the model's
    * coefficient vector rides the plan as a literal via MLlib's
    * transform; input columns pass through.
    */
  def score(
      model: LogisticRegressionModel, docs: DataFrame, textCol: String,
      dim: Int = 64): DataFrame =
    model.transform(docs.withColumn("features", features(col(textCol), dim)))
      .drop("features", "rawPrediction", "probability")
}
