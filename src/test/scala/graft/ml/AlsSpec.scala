package graft.ml

import graft.SparkSpec
import graft.etl.MovieLens
import org.apache.spark.sql.functions._

/** Seeded ALS smoke test (SURVEY §5.2 #5): shape + bounds, never hashes —
  * ALS output varies across partitionings.
  * Trains on a user subset to keep the suite fast; the full-data path is
  * identical code (q46_ml_als_recommend).
  */
class AlsSpec extends SparkSpec {

  test("ALS trains and yields exactly 10 finite recs per user with bounded RMSE") {
    val ratings = MovieLens.ratings(spark)
      .filter(col("userId") <= 150)
      .select("userId", "movieId", "rating")
      .cache()
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = AlsPipeline.train(train, maxIter = 5)
    val recs = AlsPipeline.recommendAll(model, k = 10).cache()

    val perUser = recs.groupBy("userId").count().select("count").distinct().collect()
    assert(perUser.length === 1 && perUser(0).getLong(0) === 10L,
      "every user must get exactly 10 recommendations")
    val nUsers = recs.select("userId").distinct().count()
    assert(nUsers === train.select("userId").distinct().count())
    val bad = recs.filter(col("predicted_rating").isNull ||
      isnan(col("predicted_rating"))).count()
    assert(bad === 0L)

    val err = AlsPipeline.rmse(model, test)
    assert(err < 1.6, s"held-out RMSE too high: $err")
  }
}
