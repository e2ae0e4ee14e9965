package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer + encoder semantics: the merge sequence on the classic
  * Sennrich corpus, the final segmentation, greedy non-overlapping
  * application, early exhaustion, the batched-round rule, and the encode
  * half (rank-ordered merge replay over unseen words).
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
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)))
    // stop-at-first-conflict batching: chain steps serialize, the
    // symbol-disjoint est</w> and lo share round 3
    assert(merges.map(_.round) === Seq(1, 2, 3, 3, 4))
    // the final dict IS the learned segmentation of every corpus word
    val segs = dict.select(col("word"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(segs === Map(
      "low" -> List("low", "</w>"),
      "lower" -> List("low", "e", "r", "</w>"),
      "newest" -> List("n", "e", "w", "est</w>"),
      "widest" -> List("w", "i", "d", "est</w>")))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // 'aaa' under the (a, a) merge → ["aa", "a", "</w>"], never ["aa", "aa"]
    val docs = Seq((0L, "aaa aaa")).toDF("id", "text")
    val (merges, dict) = Bpe.train(docs, "text", nMerges = 1)
    assert(merges.head.lhs === "a" && merges.head.rhs === "a")
    val syms = dict.select(col("syms")).head().getSeq[String](0).toList
    assert(syms === List("aa", "a", "</w>"))
  }

  test("stops early when every word is fully merged") {
    val docs = Seq((0L, "ab ab ab")).toDF("id", "text")
    // 'ab' needs 2 merges to collapse to one token ('ab' + '</w>'); asking
    // for 10 must stop at exhaustion, not loop
    val (merges, dict) = Bpe.train(docs, "text", nMerges = 10)
    assert(merges.length === 2)
    assert(dict.select(col("syms")).head().getSeq[String](0).toList === List("ab</w>"))
  }

  test("batched rounds: disjoint merges batch, round count meets the ceil bound") {
    // 'adbecf': the lex-ranked equal-frequency pairs (a,d) < (b,e) < (c,f)
    // are mutually symbol-disjoint, so one round takes all three —
    // 3 merges ≤ ceil(3/8) = 1 round
    val docs = Seq((0L, "adbecf adbecf adbecf adbecf")).toDF("id", "text")
    val (merges, _) = Bpe.train(docs, "text", nMerges = 3, maxPerRound = 8)
    assert(merges.map(m => (m.lhs, m.rhs)) === Seq(("a", "d"), ("b", "e"), ("c", "f")))
    assert(merges.map(_.round).max === 1)
    // maxPerRound = 1 is EXACT sequential BPE — and on this fixture the
    // two differ (the documented batching trade): sequentially, the
    // created pair (ad, b) wins the freq-4 tie lexicographically before
    // (b, e) is ever picked
    val (seq1, _) = Bpe.train(docs, "text", nMerges = 3, maxPerRound = 1)
    assert(seq1.map(m => (m.lhs, m.rhs)) === Seq(("a", "d"), ("ad", "b"), ("adb", "e")))
    assert(seq1.map(_.round) === Seq(1, 2, 3))
  }

  test("encodeWords replays the merge sequence by rank over unseen words") {
    val (merges, _) = Bpe.train(corpus, "text", nMerges = 5)
    val got = Bpe.encodeWords(
        Seq("lowest", "slower", "zz", "low").toDF("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got === Map(
      "lowest" -> List("low", "est</w>"), // es→est→est</w> then lo→low, by rank
      "slower" -> List("s", "low", "e", "r", "</w>"),
      "zz" -> List("z", "z", "</w>"), // no merge applies: character floor
      "low" -> List("low", "</w>"))) // in-corpus word reproduces its dict entry
    // chunked application (checkpoint between chunks) is the same function
    val chunked = Bpe.encodeWords(
        Seq("lowest", "slower").toDF("word"), "word", merges, checkpointEvery = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(chunked("lowest") === List("low", "est</w>"))
    assert(chunked("slower") === List("s", "low", "e", "r", "</w>"))
  }

  test("tokenCounts floor vs tokenCountsExact: encode beats the length+1 floor") {
    val (merges, dict) = Bpe.train(corpus, "text", nMerges = 5)
    val scored = Seq(
      (0L, "low lower"),        // 2 + 4, all in-dict
      (1L, "newest widest"),    // 4 + 4
      (2L, "zz low lowest")     // exact: 3 + 2 + 2; floor: (2+1) + 2 + (6+1)
    ).toDF("id", "text")
    val floor = Bpe.tokenCounts(scored, "id", "text", dict)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(floor === Map(0L -> 6L, 1L -> 8L, 2L -> 12L))
    val exact = Bpe.tokenCountsExact(scored, "id", "text", dict, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact === Map(0L -> 6L, 1L -> 8L, 2L -> 7L))
  }

  test("merge order is invariant to document partitioning") {
    val (a, _) = Bpe.train(corpus, "text", nMerges = 5)
    val (b, _) = Bpe.train(corpus.repartition(7), "text", nMerges = 5)
    assert(a === b)
  }

  test("truncateTokensBpe: clipped counts never exceed the budget; clips are word prefixes") {
    val (merges, dict) = Bpe.train(corpus, "text", nMerges = 5)
    val docs = Seq(
      (0L, "low lower widest zz"),      // 2+4+4+3 → clip after widest at 10
      (1L, "zz"),                       // 3, under budget
      (2L, "slower wider lowest low")   // 5+6 > 10 → clip after slower
    ).toDF("id", "text")
    val got = Bpe.truncateTokensBpe(docs, "id", "text", dict, merges, maxTokens = 10L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got === Map(
      0L -> (("low lower widest", 10L, 13L, true)),
      1L -> (("zz", 3L, 3L, false)),
      2L -> (("slower", 5L, 15L, true))))
    got.values.foreach { case (_, n, _, _) => assert(n <= 10L) }
    // a first word alone over the budget clips to the empty survivor
    val tight = Bpe.truncateTokensBpe(docs, "id", "text", dict, merges, maxTokens = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(tight.values.forall(v => v._1 == "" && v._2 == 0L))
    // packBins composition: bins assigned from the TRUE counts make the
    // whitespace route's bin assignment provably different on doc 2
    val exact = Bpe.tokenCountsExact(docs, "id", "text", dict, merges)
    val packed = graft.ops.Training.packBins(exact, "id", "n_tokens", budget = 12L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(packed.nonEmpty) // shard-local greedy runs on exact counts
  }

  test("packBinsBpe packs on the exact BPE counts, carried as n_tokens") {
    val (merges, dict) = Bpe.train(corpus, "text", nMerges = 5)
    val docs = Seq(
      (0L, "low lower widest zz"),     // 13 BPE tokens (4 whitespace)
      (1L, "zz"),                      // 3
      (2L, "slower wider lowest low")  // 15 (4 whitespace)
    ).toDF("id", "text")
    val packed = graft.ops.Training.packBinsBpe(
        docs, "id", "text", dict, merges, budget = 12L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("bin")))).toMap
    // the carried count IS tokenCountsExact's answer (not whitespace's)
    assert(packed.view.mapValues(_._1).toMap === Map(0L -> 13L, 1L -> 3L, 2L -> 15L))
    // bin assignment replays packBins' floor rule over those counts,
    // per md5 shard (all three ids shard apart here or together — either
    // way the start-offset rule must hold within each shard)
    val byShard = graft.ops.Training.packBinsBpe(
        docs, "id", "text", dict, merges, budget = 12L)
      .collect().groupBy(_.getAs[String]("shard"))
    byShard.values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("id")).foreach { r =>
        assert(r.getAs[Long]("bin") === cum / 12L)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }
}
