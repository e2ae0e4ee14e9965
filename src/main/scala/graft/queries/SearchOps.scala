package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.search.Scoring

/** Search/relevance operator battery (SURVEY §2.8 Q1–Q11 semantics) exercised
  * over the testdata tables so each class gets a DuckDB-oracle row. The same
  * Column builders ([[graft.search.Scoring]]) power the MovieLens engine
  * facade ([[graft.api.Engine]]).
  */
object SearchOps {

  val defs: Seq[QueryDef] = Seq(

    // Q1: phrase containment on an analyzed (lowercased) text field.
    QueryDef(
      "q15_phrase_match",
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(Scoring.phraseMatch(col("text"), "spark window"))
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, lang, source FROM documents
        WHERE strpos(lower(text), 'spark window') > 0
        ORDER BY doc_id""")),

    // Q7/Q11/O4/O2: multi-field match with field boost (name^3, type^1),
    // deterministic relevance score, ranked + tie-broken + limited.
    QueryDef(
      "q16_multimatch_boost",
      (s, dir) => {
        val terms = Seq("green", "small")
        val score = Scoring.multiMatch(
          terms, Seq(col("p_name") -> 3, col("p_type") -> 1))
        Tables.part(s, dir)
          .withColumn("score", score)
          .filter(col("score") >= 1)
          .select(col("p_partkey"), col("p_name"), col("p_type"), col("score"))
          .orderBy(col("score").desc, col("p_partkey"))
          .limit(25)
      },
      Some("""
        SELECT p_partkey, p_name, p_type,
          (CASE WHEN strpos(lower(p_name), 'green') > 0 THEN 3 ELSE 0 END
         + CASE WHEN strpos(lower(p_type), 'green') > 0 THEN 1 ELSE 0 END
         + CASE WHEN strpos(lower(p_name), 'small') > 0 THEN 3 ELSE 0 END
         + CASE WHEN strpos(lower(p_type), 'small') > 0 THEN 1 ELSE 0 END) AS score
        FROM part
        WHERE (CASE WHEN strpos(lower(p_name), 'green') > 0 THEN 3 ELSE 0 END
             + CASE WHEN strpos(lower(p_type), 'green') > 0 THEN 1 ELSE 0 END
             + CASE WHEN strpos(lower(p_name), 'small') > 0 THEN 3 ELSE 0 END
             + CASE WHEN strpos(lower(p_type), 'small') > 0 THEN 1 ELSE 0 END) >= 1
        ORDER BY score DESC, p_partkey LIMIT 25""")),

    // Q10: fuzziness-AUTO edit-distance match (levenshtein ≤ auto(len)).
    QueryDef(
      "q17_fuzzy_brand",
      (s, dir) =>
        Tables.part(s, dir)
          .filter(Scoring.fuzzyMatch(col("p_brand"), "Brand#13"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("p_brand")),
      Some("""
        SELECT p_brand, count(*) AS n_parts FROM part
        WHERE levenshtein(lower(trim(p_brand)), 'brand#13') <= 2
        GROUP BY p_brand ORDER BY p_brand""")),

    // Q5: bool-should with minimum_should_match=2; score = matched terms.
    QueryDef(
      "q18_min_should_match",
      (s, dir) => {
        val terms = Seq("spark", "window", "join", "stream")
        val score = Scoring.shouldMatchCount(col("text"), terms)
        Tables.documents(s, dir)
          .withColumn("score", score)
          .filter(col("score") >= 2)
          .select(col("doc_id"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""
        SELECT doc_id,
          (CASE WHEN strpos(lower(text), 'spark') > 0 THEN 1 ELSE 0 END
         + CASE WHEN strpos(lower(text), 'window') > 0 THEN 1 ELSE 0 END
         + CASE WHEN strpos(lower(text), 'join') > 0 THEN 1 ELSE 0 END
         + CASE WHEN strpos(lower(text), 'stream') > 0 THEN 1 ELSE 0 END) AS score
        FROM documents
        WHERE (CASE WHEN strpos(lower(text), 'spark') > 0 THEN 1 ELSE 0 END
             + CASE WHEN strpos(lower(text), 'window') > 0 THEN 1 ELSE 0 END
             + CASE WHEN strpos(lower(text), 'join') > 0 THEN 1 ELSE 0 END
             + CASE WHEN strpos(lower(text), 'stream') > 0 THEN 1 ELSE 0 END) >= 2
        ORDER BY score DESC, doc_id""")),

    // Q3: terms filter / overlap score on an array column (genre-overlap
    // analog built from p_type tokens).
    QueryDef(
      "q19_terms_overlap",
      (s, dir) => {
        val queryTerms = array(lit("economy"), lit("standard"))
        Tables.part(s, dir)
          .withColumn("type_terms", split(lower(col("p_type")), " "))
          .filter(arrays_overlap(col("type_terms"), queryTerms))
          .groupBy(col("p_type"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("p_type"))
      },
      Some("""
        SELECT p_type, count(*) AS n_parts FROM part
        WHERE len(list_intersect(string_split(lower(p_type), ' '), ['economy', 'standard'])) > 0
        GROUP BY p_type ORDER BY p_type""")),
  )
}
