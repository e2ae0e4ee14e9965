package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Engine
import graft.etl.MovieLens
import graft.ml.AlsPipeline
import graft.sources.Store

/** Reference-parity battery over the real MovieLens-100k data
  * (`/root/reference/data`, read-only). These exercise the reference's own
  * dataflows end-to-end (S1–S3, U1, J1/J2, A1–A3, Q1–Q11, M1/M2).
  *
  * Every query here (q40–q46, q58) carries a DuckDB oracle: the twin reads
  * `u.data` directly (pure ASCII) and, for `u.item`, the committed UTF-8
  * transcode `fixtures/u_item_utf8.csv` (DuckDB 1.0 cannot decode
  * ISO-8859-1; FixtureSpec pins the transcode byte-for-byte against the
  * reference file). The ES-semantics twins (q44/q45) replay the scoring in
  * flag space; the ALS twins (q46/q58) verify the exact serving contract
  * (10 distinct non-null-scored recs per training user) — factor values
  * are partitioning-nondeterministic, so those are pinned as bounds in
  * AlsSpec, not hashes.
  */
object MovieLensQ {

  /** `u.item` as a DuckDB relation: 24 unnamed varchar columns
    * (5 meta + 19 genre flags), no quoting — mirrors
    * [[MovieLens.moviesRawSchema]].
    */
  private val ItemCsv =
    "read_csv('/root/repo/fixtures/u_item_utf8.csv', delim='|', header=false, quote='', all_varchar=true)"

  private val RatingsCsv =
    "read_csv('/root/reference/data/u.data', delim='\\t', header=false, " +
      "columns={'userId':'INTEGER','movieId':'INTEGER','rating':'INTEGER','ts':'INTEGER'})"

  /** Genre-name list literal, generated from the same [[MovieLens.genreNames]]
    * the Spark side unpivots with — the twin can't drift from the engine.
    * Flags start at column05 (`unknown`); names skip it → column06+.
    */
  private def genreCol(i: Int): String = f"column${i + 6}%02d"

  private val GenreList: String = {
    val cases = MovieLens.genreNames.zipWithIndex.map { case (g, i) =>
      s"CASE WHEN ${genreCol(i)}='1' THEN '$g' END"
    }
    s"list_filter([${cases.mkString(", ")}], x -> x IS NOT NULL)"
  }

  /** Genre-overlap count between a movie row `m` and the query row `q` —
    * the twin of [[graft.search.Scoring.overlapScore]] in flag space.
    */
  private val OverlapSql: String =
    MovieLens.genreNames.indices
      .map(i => s"CASE WHEN m.${genreCol(i)}='1' AND q.${genreCol(i)}='1' THEN 1 ELSE 0 END")
      .mkString(" + ")

  /** Twin of [[graft.search.Scoring.fuzzyMultiMatch]] for one field: each
    * term scores `boost` if any whitespace token of the normalized field is
    * within the term's AUTO edit budget.
    */
  private def fuzzyFieldSql(fieldExpr: String, terms: Seq[String], boost: Int): String = {
    val toks = s"regexp_split_to_array(lower(trim($fieldExpr)), '\\s+')"
    terms.map { term =>
      val budget = graft.search.Scoring.autoFuzz(term.length)
      s"CASE WHEN len(list_filter($toks, t -> levenshtein(t, '${term.toLowerCase}') <= $budget)) > 0 THEN $boost ELSE 0 END"
    }.mkString(" + ")
  }

  /** Shared by q45 (full-scan scoring) and q67 (posting-table scoring):
    * one oracle, two physical routes — the twin pins their equivalence.
    */
  private lazy val FuzzySearchOracle: String = s"""
        WITH scored AS (
          SELECT CAST(column00 AS INT) AS movieId, column01 AS title,
            CAST((${fuzzyFieldSql("column01", Seq("star", "wras"), 3)})
               + (${fuzzyFieldSql(s"coalesce(array_to_string($GenreList, ' '), '')", Seq("star", "wras"), 1)})
              AS INT) AS score
          FROM $ItemCsv)
        SELECT movieId, title, score FROM scored WHERE score >= 1
        ORDER BY score DESC, movieId LIMIT 10 OFFSET 0"""

  val defs: Seq[QueryDef] = Seq(

    // S2/S3/U1: Latin-1 pipe CSV → single-pass genre unpivot.
    // coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is ''.
    QueryDef(
      "q40_ml_movies",
      (s, _) =>
        MovieLens.movies(s)
          .select(col("movieId"), col("title"), col("release_date"),
            array_join(col("genres"), "|").as("genres"))
          .orderBy(col("movieId")),
      Some(s"""
        SELECT CAST(column00 AS INT) AS movieId, column01 AS title,
               column02 AS release_date,
               coalesce(array_to_string($GenreList, '|'), '') AS genres
        FROM $ItemCsv ORDER BY movieId""")),

    // S1/P5/J1: TSV read, na.drop, broadcast join → rating distribution.
    // The twin replays na.drop + the inner join's movieId semijoin filter.
    QueryDef(
      "q41_ml_rating_dist",
      (s, _) =>
        MovieLens.processed(s)
          .groupBy(col("rating"))
          .agg(count(lit(1)).as("n_ratings"))
          .orderBy(col("rating")),
      Some(s"""
        SELECT rating, count(*) AS n_ratings FROM $RatingsCsv
        WHERE userId IS NOT NULL AND movieId IS NOT NULL
          AND rating IS NOT NULL AND ts IS NOT NULL
          AND movieId IN (SELECT CAST(column00 AS INT) FROM $ItemCsv)
        GROUP BY rating ORDER BY rating""")),

    // A2/P6/O1: genre-count histogram (name-array semantics).
    QueryDef(
      "q42_ml_genre_histogram",
      (s, _) => MovieLens.genreCountHistogram(MovieLens.movies(s)),
      Some(s"""
        SELECT CAST(len($GenreList) AS INT) AS num_genres, count(*) AS n_movies
        FROM $ItemCsv GROUP BY 1 ORDER BY num_genres""")),

    // A3/U2/O2: top-20 genre frequency (ES terms-agg analog).
    QueryDef(
      "q43_ml_top_genres",
      (s, _) => MovieLens.topGenres(MovieLens.movies(s)),
      Some(s"""
        SELECT genre, count(*) AS n_movies
        FROM (SELECT unnest($GenreList) AS genre FROM $ItemCsv)
        GROUP BY genre ORDER BY n_movies DESC, genre LIMIT 20""")),

    // Q1+Q3+Q4+O2: the full /recommend flow for a unique title. The twin
    // replays phrase lookup + genre-overlap scoring in flag space.
    QueryDef(
      "q44_ml_recommend",
      (s, _) =>
        Engine.recommend(MovieLens.movies(s), "Toy Story (1995)") match {
          case Engine.Recommendations(_, recs) =>
            recs.select(col("movieId"), col("title"), col("score"))
          case other =>
            sys.error(s"expected Recommendations for Toy Story, got $other")
        },
      Some(s"""
        WITH q AS (
          SELECT * FROM $ItemCsv
          WHERE contains(lower(trim(column01)), 'toy story (1995)'))
        SELECT CAST(m.column00 AS INT) AS movieId, m.column01 AS title,
               CAST($OverlapSql AS INT) AS score
        FROM $ItemCsv m CROSS JOIN q
        WHERE m.column00 <> q.column00 AND ($OverlapSql) >= 1
          -- self-check: the Spark side errors loudly on an ambiguous phrase
          -- (Disambiguation); if the phrase ever matched several movies this
          -- twin would otherwise silently score against every match, so
          -- collapse to zero rows (a visible row-count mismatch) instead
          AND (SELECT count(*) FROM q) = 1
        ORDER BY score DESC, movieId LIMIT 5""")),

    // Q7+Q10+O3: fuzzy boosted multi-field search, page 1 — twin replays
    // title^3 + genres^1 token-level levenshtein under the AUTO budgets.
    QueryDef(
      "q45_ml_search",
      (s, _) =>
        Engine.search(MovieLens.movies(s), "star wras", page = 1, size = 10)
          .select(col("movieId"), col("title"), col("score")),
      Some(FuzzySearchOracle)),

    // The SAME search through the posting-table path ([[graft.search
    // .Posting]]): offline symmetric-delete index (built once per JVM into
    // a Store table) + broadcast variant join + exact levenshtein on
    // candidates only. The oracle is q45's VERBATIM — the gate pins that
    // the O(candidates) path returns bit-identical results to the
    // O(corpus) scan it replaces; PlanSpec pins that the plan actually
    // takes the index route.
    QueryDef(
      "q67_ml_search_posting",
      (s, _) => {
        ensurePostingTable(s)
        Engine.searchViaPosting(
            MovieLens.movies(s), Store.read(s, PostingTable), "star wras",
            page = 1, size = 10)
          .select(col("movieId"), col("title"), col("score"))
      },
      Some(FuzzySearchOracle)),

    // M1/M2/W1/U2: ALS train + top-10/user + explode. Factor values are
    // nondeterministic across partitionings (bounds pinned in AlsSpec), but
    // the M2 contract — exactly 10 recs for every training user — is exact,
    // so that is what the query emits and the twin verifies.
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
      Some(s"""
        SELECT DISTINCT userId, CAST(10 AS BIGINT) AS n_recs
        FROM $RatingsCsv ORDER BY userId""")),

    // S7+M2 serving loop (`model.py:18-24` persists 9,430 per-user recs to
    // ES; `api.py` point-reads a user's list): the trained model's top-10s
    // are bulk-written ONCE per JVM into a userId-bucketed Store table (an
    // offline rebuild, like the IVF index build), and the query is the
    // ONLINE read path — per-user lists back off the bucketed table. The
    // twin verifies the serving contract per user: 10 distinct movies, all
    // scored.
    QueryDef(
      "q58_ml_rec_serving",
      (s, _) => {
        ensureServingTable(s)
        Store.read(s, ServingTable)
          .filter(col("userId") <= 50)
          .groupBy(col("userId"))
          .agg(
            count(lit(1)).as("n_recs"),
            countDistinct(col("movieId")).as("distinct_movies"),
            (count(lit(1)) === count(col("predicted_rating"))).as("scores_present"))
          .orderBy(col("userId"))
      },
      Some(s"""
        SELECT DISTINCT userId, CAST(10 AS BIGINT) AS n_recs,
               CAST(10 AS BIGINT) AS distinct_movies, true AS scores_present
        FROM $RatingsCsv WHERE userId <= 50 ORDER BY userId""")),
  )

  private val ServingTable = "recommendations"
  private val PostingTable = "movie_posting"

  /** One-time (per JVM) offline build of the fuzzy-search posting index:
    * title + genre tokens → symmetric-delete variants → Store table keyed
    * by variant (the join key). ~37 variants/token at d=2 over 1,682
    * movies — an index build, not a query cost.
    */
  private val postingBuilt = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private def ensurePostingTable(s: org.apache.spark.sql.SparkSession): Unit =
    postingBuilt.getOrElseUpdate(PostingTable, {
      val posting = graft.search.Posting.buildPosting(
        MovieLens.movies(s), "movieId",
        Seq("title" -> col("title"), "genres" -> concat_ws(" ", col("genres"))))
      Store.bulkWrite(posting, PostingTable, "variant")
      true
    })

  /** One-time (per JVM) offline rebuild of the serving table: ALS train →
    * top-10 per user → [[Store.bulkWrite]] bucketed by userId, so the
    * online lookup prunes to one bucket (StoreSpec pins
    * SelectedBucketsCount). The declared schema replays the reference's
    * ES-mapping check on its recommendations index.
    */
  private val servingBuilt = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private def ensureServingTable(s: org.apache.spark.sql.SparkSession): Unit =
    servingBuilt.getOrElseUpdate(ServingTable, {
      val model = AlsPipeline.train(
        MovieLens.processed(s).select(col("userId"), col("movieId"), col("rating")))
      Store.bulkWrite(
        AlsPipeline.recommendAll(model, k = 10), ServingTable, "userId",
        declared = Some(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("userId", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("movieId", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("predicted_rating", org.apache.spark.sql.types.FloatType)))))
      true
    })
}
