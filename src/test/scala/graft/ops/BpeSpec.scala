package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer semantics: the merge sequence on the classic Sennrich
  * corpus, the final segmentation, greedy non-overlapping application,
  * and early exhaustion.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq.fill(5)("low").mkString(" ")),
    (1L, Seq.fill(2)("lower").mkString(" ")),
    (2L, Seq.fill(6)("newest").mkString(" ")),
    (3L, Seq.fill(3)("widest").mkString(" "))).toDF("id", "text")

  test("learns the hand-computed merge sequence with lexicographic tie-breaks") {
    val (merges, dict) = Bpe.train(corpus, "text", nMerges = 5)
    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.merged, m.freq)) === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "_", "est_", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)))
    // the final dict IS the learned segmentation of every corpus word
    val segs = dict.select(col("word"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(segs === Map(
      "low" -> List("low", "_"),
      "lower" -> List("low", "e", "r", "_"),
      "newest" -> List("n", "e", "w", "est_"),
      "widest" -> List("w", "i", "d", "est_")))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // 'aaa' under the (a, a) merge → ["aa", "a", "_"], never ["aa", "aa"]
    val docs = Seq((0L, "aaa aaa")).toDF("id", "text")
    val (merges, dict) = Bpe.train(docs, "text", nMerges = 1)
    assert(merges.head.lhs === "a" && merges.head.rhs === "a")
    val syms = dict.select(col("syms")).head().getSeq[String](0).toList
    assert(syms === List("aa", "a", "_"))
  }

  test("stops early when every word is fully merged") {
    val docs = Seq((0L, "ab ab ab")).toDF("id", "text")
    // 'ab' needs 2 merges to collapse to one token ('ab' + '_'); asking
    // for 10 must stop at exhaustion, not loop
    val (merges, dict) = Bpe.train(docs, "text", nMerges = 10)
    assert(merges.length === 2)
    assert(dict.select(col("syms")).head().getSeq[String](0).toList === List("ab_"))
  }

  test("tokenCounts: learned segmentation sizes, with the length+1 OOV floor") {
    val (_, dict) = Bpe.train(corpus, "text", nMerges = 5)
    val scored = Seq(
      (0L, "low lower"),        // 2 + 4
      (1L, "newest widest"),    // 4 + 4
      (2L, "zz low unseenword") // (2+1) + 2 + (10+1)
    ).toDF("id", "text")
    val got = Bpe.tokenCounts(scored, "id", "text", dict)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 6L, 1L -> 8L, 2L -> 16L))
  }

  test("merge order is invariant to document partitioning") {
    val (a, _) = Bpe.train(corpus, "text", nMerges = 5)
    val (b, _) = Bpe.train(corpus.repartition(7), "text", nMerges = 5)
    assert(a === b)
  }
}
