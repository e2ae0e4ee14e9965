package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Value gate for the learned curation classifier ([[TextClassifier]]):
  * a separable two-vocabulary corpus must classify perfectly out of
  * sample, and scoring must preserve the input columns (it is the
  * map-only pass a pipeline chains from).
  */
class TextClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val label = i % 2
      val prefix = if (label == 0) "good" else "junk"
      (i.toLong, Seq.fill(20)(s"$prefix${rnd.nextInt(15)}").mkString(" "), label)
    }.toDF("id", "text", "label")
  }

  test("disjoint vocabularies separate perfectly out of sample") {
    val train = corpus(200, seed = 7L)
    val test = corpus(80, seed = 991L) // fresh draws, same distributions
    val model = TextClassifier.train(train, "text", "label", dim = 64)
    val scored = TextClassifier.score(model, test, "text", dim = 64)
    val wrong = scored
      .filter(col("prediction") =!= col("label").cast("double")).count()
    assert(wrong === 0L, s"$wrong of 80 held-out docs misclassified")
  }

  test("score passes input columns through and adds only prediction") {
    val df = corpus(20, seed = 3L)
    val model = TextClassifier.train(df, "text", "label", dim = 64)
    val scored = TextClassifier.score(model, df, "text", dim = 64)
    assert(scored.columns.toSet === Set("id", "text", "label", "prediction"))
    assert(scored.count() === 20L)
  }
}
