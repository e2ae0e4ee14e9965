package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Engine
import graft.etl.MovieLens
import graft.ml.AlsPipeline

/** Reference-parity battery over the real MovieLens-100k data
  * (`/root/reference/data`, read-only). These exercise the reference's own
  * dataflows end-to-end (S1–S3, U1, J1/J2, A1–A3, Q1–Q11, M1/M2); inputs are
  * local CSVs rather than the driver's parquet star schema, so they are
  * rows-only checks here — their numeric invariants (1,682 movies, rating
  * distribution, genre histograms) are pinned exactly in ScalaTest golden
  * suites instead.
  */
object MovieLensQ {

  val defs: Seq[QueryDef] = Seq(

    // S2/S3/U1: Latin-1 pipe CSV → single-pass genre unpivot.
    QueryDef(
      "q40_ml_movies",
      (s, _) =>
        MovieLens.movies(s)
          .select(col("movieId"), col("title"), col("release_date"),
            array_join(col("genres"), "|").as("genres"))
          .orderBy(col("movieId")),
      None),

    // S1/P5/J1: TSV read, na.drop, broadcast join → rating distribution.
    QueryDef(
      "q41_ml_rating_dist",
      (s, _) =>
        MovieLens.processed(s)
          .groupBy(col("rating"))
          .agg(count(lit(1)).as("n_ratings"))
          .orderBy(col("rating")),
      None),

    // A2/P6/O1: genre-count histogram (name-array semantics).
    QueryDef(
      "q42_ml_genre_histogram",
      (s, _) => MovieLens.genreCountHistogram(MovieLens.movies(s)),
      None),

    // A3/U2/O2: top-20 genre frequency (ES terms-agg analog).
    QueryDef(
      "q43_ml_top_genres",
      (s, _) => MovieLens.topGenres(MovieLens.movies(s)),
      None),

    // Q1+Q3+Q4+O2: the full /recommend flow for a unique title.
    QueryDef(
      "q44_ml_recommend",
      (s, _) =>
        Engine.recommend(MovieLens.movies(s), "Toy Story (1995)") match {
          case Engine.Recommendations(_, recs) =>
            recs.select(col("movieId"), col("title"), col("score"))
          case other =>
            sys.error(s"expected Recommendations for Toy Story, got $other")
        },
      None),

    // Q7+Q10+O3: fuzzy boosted multi-field search, page 1.
    QueryDef(
      "q45_ml_search",
      (s, _) =>
        Engine.search(MovieLens.movies(s), "star wras", page = 1, size = 10)
          .select(col("movieId"), col("title"), col("score")),
      None),

    // M1/M2/W1/U2: ALS train + top-10/user + explode. Nondeterministic
    // across partitionings → rows-only; bounds pinned in ScalaTest.
    QueryDef(
      "q46_ml_als_recommend",
      (s, _) => {
        val model = AlsPipeline.train(MovieLens.processed(s)
          .select(col("userId"), col("movieId"), col("rating")))
        AlsPipeline.recommendAll(model, k = 10)
          .groupBy(col("userId"))
          .agg(count(lit(1)).as("n_recs"))
          .orderBy(col("userId"))
      },
      None),
  )
}
