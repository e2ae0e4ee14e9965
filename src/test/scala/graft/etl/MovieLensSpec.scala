package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end invariants measured from the reference's own data
  * (`/root/reference/data`) — SURVEY §5.2 #2 / BASELINE.md facts.
  */
class MovieLensSpec extends SparkSpec {

  test("u.item loads 1,682 movies with Latin-1 titles intact") {
    val m = MovieLens.movies(spark)
    assert(m.count() === 1682L)
    val title543 = m.filter(col("movieId") === 543).select("title").head().getString(0)
    assert(title543.contains("Misérables"), s"mojibake? got: $title543")
  }

  test("flag-count histogram matches the measured golden distribution") {
    val hist = MovieLens.flagCountHistogram(MovieLens.moviesRaw(spark))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(1 -> 833L, 2 -> 569L, 3 -> 215L, 4 -> 51L, 5 -> 11L, 6 -> 3L))
  }

  test("unknown-only movies 267 and 1373 get empty genre-name arrays") {
    val genreless = MovieLens.movies(spark)
      .filter(size(col("genres")) === 0)
      .select("movieId").collect().map(_.getInt(0)).sorted
    assert(genreless.toSeq === Seq(267, 1373))
  }

  test("ratings: 100k rows, all ratings in 1..5, golden distribution") {
    val dist = MovieLens.ratings(spark)
      .groupBy("rating").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist === Map(1 -> 6110L, 2 -> 11370L, 3 -> 27145L, 4 -> 34174L, 5 -> 21201L))
    assert(dist.values.sum === 100000L)
  }

  test("processed join keeps one row per rating (movies unique on movieId)") {
    val p = MovieLens.processed(spark)
    assert(p.count() === 100000L)
    assert(p.columns.toSeq ===
      Seq("movieId", "userId", "rating", "timestamp", "title", "genres"))
  }

  test("genre-name histogram shifts the two unknown-only movies to bucket 0") {
    val hist = MovieLens.genreCountHistogram(MovieLens.movies(spark))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // name semantics drop `unknown`: 833-flag bucket loses 2 movies to 0
    assert(hist(0) === 2L)
    assert(hist(1) === 831L)
    assert(hist.values.sum === 1682L)
  }

  test("top genre is Drama (725 movies)") {
    val top = MovieLens.topGenres(MovieLens.movies(spark), 3).head()
    assert(top.getString(0) === "Drama")
    assert(top.getLong(1) === 725L)
  }
}
