package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("fuzziness AUTO thresholds follow the ES rule (0 / 1 / 2 edits)") {
    assert(Scoring.autoFuzz(1) === 0)
    assert(Scoring.autoFuzz(2) === 0)
    assert(Scoring.autoFuzz(3) === 1)
    assert(Scoring.autoFuzz(5) === 1)
    assert(Scoring.autoFuzz(6) === 2)
    assert(Scoring.autoFuzz(20) === 2)
  }

  test("phraseMatch is case-insensitive containment") {
    val df = Seq("Toy Story (1995)", "Toy Soldiers", "Star Wars").toDF("title")
    val hits = df.filter(Scoring.phraseMatch($"title", "toy story"))
      .as[String].collect()
    assert(hits.toSeq === Seq("Toy Story (1995)"))
  }

  test("shouldMatchCount counts distinct matched terms") {
    val df = Seq("alpha beta gamma").toDF("t")
    val n = df.select(Scoring.shouldMatchCount($"t", Seq("alpha", "gamma", "zeta")))
      .head().getInt(0)
    assert(n === 2)
  }

  test("multiMatch applies field boosts (title^3 + genres^1)") {
    val df = Seq(("star wars", "action sci-fi")).toDF("title", "genres")
    val score = df.select(
      Scoring.multiMatch(Seq("star", "action"), Seq($"title" -> 3, $"genres" -> 1)))
      .head().getInt(0)
    // "star" hits title (3), "action" hits genres (1)
    assert(score === 4)
  }

  test("fuzzyMultiMatch tolerates AUTO-budget typos on tokens") {
    val df = Seq(("star wars", "action")).toDF("title", "genres")
    // "wras" is 2 edits from "wars" (len 4 → budget 1) → no title hit;
    // "stra" is 2 edits from "star"... use "sta r"? keep: "starr" is 1 edit.
    val score = df.select(
      Scoring.fuzzyMultiMatch(Seq("starr"), Seq($"title" -> 3, $"genres" -> 1)))
      .head().getInt(0)
    assert(score === 3)
  }

  test("scoring monotonicity: matching more terms never lowers the score") {
    val df = Seq("alpha beta gamma delta").toDF("t")
    val s1 = df.select(Scoring.shouldMatchCount($"t", Seq("alpha"))).head().getInt(0)
    val s2 = df.select(Scoring.shouldMatchCount($"t", Seq("alpha", "beta"))).head().getInt(0)
    assert(s2 >= s1)
  }

  test("overlapScore = |field ∩ query|") {
    val df = Seq(Seq("Action", "Comedy", "Drama")).toDF("genres")
    val s = df.select(Scoring.overlapScore($"genres", Seq("Comedy", "Drama", "War")))
      .head().getInt(0)
    assert(s === 2)
  }
}
