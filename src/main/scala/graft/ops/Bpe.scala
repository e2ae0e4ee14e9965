package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016) — TRAINING (learn a
  * merge sequence from the corpus) and ENCODING (apply a learned merge
  * sequence to arbitrary words), the subword-vocabulary step of a
  * training-data pipeline where [[TextStats.subwordCountEstimate]] is only
  * a counting heuristic.
  *
  * Scale shape (the classic one, and the reason BPE trains fast at any
  * corpus size): merges operate on the WORD-FREQUENCY DICTIONARY, not the
  * corpus. One corpus scan builds (word, count) — a single map-side
  * combinable aggregate whose output is the distinct-word set (Zipf: a few
  * million rows at 100 TB, corpus-size-independent). Each merge ROUND is
  * then two tiny jobs over the dict (the Lloyd's-iteration shape of
  * [[Clustering.lloyd]]):
  *
  *  1. pair counts — adjacent-symbol pairs weighted by word count, one
  *     map-side-combinable aggregate;
  *  2. the ranked head — `orderBy(freq desc, lhs, rhs).limit(…)`, a
  *     TakeOrderedAndProject collecting a HANDFUL of rows to the driver,
  *     from which the round's merge BATCH is selected (see [[train]]);
  *
  * followed by a map-only rewrite of the dict's symbol arrays applying the
  * whole batch. The dict is re-checkpointed per round so lineage stays flat
  * across hundreds of rounds. Nothing in the loop grows with corpus size,
  * and the only driver-side data is a few (pair, freq) rows per round.
  *
  * Determinism: ties on pair frequency break lexicographically on
  * (lhs, rhs), so the learned merge sequence is a pure function of the
  * corpus — reshuffle/rerun/engine stable, which is what lets the q119
  * gate replay the merge order closed-form.
  */
object Bpe {

  /** End-of-word marker symbol, appended to every word's symbol sequence
    * as ONE multi-character symbol (Sennrich's literal `</w>`): merges
    * crossing the marker learn word-final subwords distinct from
    * word-internal ones. A multi-char out-of-alphabet marker (not `_`,
    * which legitimately occurs inside snake_case/code tokens) keeps
    * word-internal text distinguishable from the marker. Stated
    * restriction: a whitespace token containing the LITERAL text `</w>`
    * would collide with the marker — vanishingly rare in natural text;
    * strip or escape it upstream if the corpus can contain raw markup
    * fragments as single tokens.
    */
  val EndMark = "</w>"

  /** One learned merge: at `step`, the most frequent adjacent symbol pair
    * (lhs, rhs) with weight `freq` became token `merged`; `round` is the
    * batched training round that selected it (see [[train]] — several
    * mutually-non-adjacent merges can share a round).
    */
  final case class BpeMerge(
      step: Int, lhs: String, rhs: String, merged: String, freq: Long, round: Int)

  /** The word-frequency dictionary: whitespace tokens and their corpus
    * counts. The ONE corpus-sized pass in the trainer.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  private def initSyms(word: Column): Column =
    concat(split(word, ""), array(lit(EndMark)))

  /** Adjacent-pair frequencies over the dict, weighted by word count. */
  private def pairFreqs(dict: DataFrame): DataFrame =
    dict
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("freq"))

  /** Greedy left-to-right merge of adjacent (lhs, rhs) in a symbol array:
    * a fold that either fuses the current symbol into the accumulator's
    * tail or appends it. Left-to-right non-overlapping is the standard
    * BPE application order ("aaa" under (a,a) → ["aa","a"]). Interpreted
    * HOF, but it runs over the DICT, never the corpus.
    */
  private def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(s))))

  /** ENCODE: apply a trained merge sequence, in rank order, to arbitrary
    * words — the tokenizer's second half, giving out-of-vocabulary words
    * their TRUE learned segmentation instead of a character floor. Input
    * is a (wordCol) frame of DISTINCT words (Zipf-sized — encode the
    * dictionary, never the corpus; [[tokenCountsExact]] does exactly
    * that); output is (word, syms).
    *
    * Each merge is one map-only array rewrite ([[applyMerge]]), chained
    * `checkpointEvery` merges per `select` and re-checkpointed between
    * chunks so the expression tree and lineage stay bounded for large
    * vocabularies. Cost is O(|merges| × |words|) symbol-fold work — the
    * dense replay every reference BPE encoder performs (rank-ordered
    * merge application), run as Spark map stages over the word frame.
    */
  def encodeWords(
      words: DataFrame, wordCol: String, merges: Seq[BpeMerge],
      checkpointEvery: Int = 32): DataFrame = {
    require(checkpointEvery >= 1, "need a positive chunk size")
    val init = words.select(col(wordCol).as("word"), initSyms(col(wordCol)).as("syms"))
    val chunks = merges.sortBy(_.step).grouped(checkpointEvery).toSeq
    chunks.zipWithIndex.foldLeft(init) { case (df, (chunk, i)) =>
      val applied = df.withColumn("syms",
        chunk.foldLeft(col("syms"))((s, m) => applyMerge(s, m.lhs, m.rhs)))
      // flatten lineage between chunks; the last chunk stays lazy so a
      // small-vocabulary encode composes into the caller's plan unmaterialized
      if (i < chunks.size - 1) {
        val cp = applied.localCheckpoint()
        df.unpersist()
        cp
      } else applied
    }
  }

  /** Per-document TOKEN COUNTS under a trained vocabulary — the number
    * the packing budget ([[Training.packBins]]) and per-language fertility
    * stats actually consume, replacing [[TextStats.subwordCountEstimate]]'s
    * regex heuristic once a vocabulary exists. Corpus words broadcast-join
    * the (word → |syms|) dictionary (Zipf-sized, the same reason training
    * is dict-side); the scan stays map-local. OOV policy, stated: a word
    * absent from the dict counts `length + 1` tokens (its character
    * segmentation with the end marker — the floor any merge sequence
    * starts from). [[tokenCountsExact]] replaces the floor with the true
    * learned segmentation; this overload remains for callers without the
    * merge sequence at hand. Returns (idCol, n_tokens).
    */
  def tokenCounts(
      docs: DataFrame, idCol: String, textCol: String, dict: DataFrame): DataFrame = {
    val sizes = broadcast(
      dict.select(col("word"), size(col("syms")).cast("long").as("__sz")))
    docs.select(col(idCol), explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(sizes, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__sz"), length(col("word")).cast("long") + 1L))
        .as("n_tokens"))
  }

  /** EXACT per-document token counts: in-dictionary words take their
    * trained segmentation size, out-of-vocabulary words are ENCODED
    * ([[encodeWords]] — the merge sequence replayed by rank), so every
    * count is the true tokenizer output, not a floor. Scale shape: the
    * corpus scan builds the distinct-word set (Zipf-sized), the OOV
    * subset (anti-join against the trained dict) is encoded once per
    * DISTINCT word, and the merged (word → size) map broadcast-joins back
    * to the word occurrences — the corpus is never re-segmented row by
    * row. Returns (idCol, n_tokens).
    */
  def tokenCountsExact(
      docs: DataFrame, idCol: String, textCol: String, dict: DataFrame,
      merges: Seq[BpeMerge]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    words
      .join(wordSizes(words, dict, merges), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__sz")).as("n_tokens"))
  }

  /** The broadcast `(word → true token count)` map shared by
    * [[tokenCountsExact]] and [[truncateTokensBpe]]: in-dictionary words
    * take their trained segmentation size, the distinct OOV set is
    * encoded once ([[encodeWords]]). Zipf-sized, hence broadcastable.
    */
  private def wordSizes(
      words: DataFrame, dict: DataFrame, merges: Seq[BpeMerge]): DataFrame = {
    val oovSizes = encodeWords(
        words.select(col("word")).distinct()
          .join(dict.select(col("word")), Seq("word"), "left_anti"),
        "word", merges)
      .select(col("word"), size(col("syms")).cast("long").as("__sz"))
    broadcast(
      dict.select(col("word"), size(col("syms")).cast("long").as("__sz"))
        .unionByName(oovSizes))
  }

  /** TOKENIZER-ACCURATE BUDGET TRUNCATION (r12 verdict #5 —
    * [[Training.truncateTokens]]'s whitespace count replaced by the true
    * BPE count): clip each document to its longest word prefix whose BPE
    * token total fits `maxTokens`. Whitespace budgeting provably
    * over-admits — a word is ≥ 1 BPE token and usually several, so "first
    * N whitespace tokens" can exceed an N-token context by a multiple —
    * while this route is ≤ budget BY CONSTRUCTION (q190 gates both
    * claims). Truncation is word-aligned because merges never cross the
    * `</w>` boundary: a document's token stream is the concatenation of
    * its words' segmentations, so the largest admissible PREFIX of words
    * is exactly the largest admissible prefix of tokens that ends on a
    * word boundary.
    *
    * Scale shape: one broadcast join against the [[wordSizes]] map, one
    * id-keyed window for the running total (the [[Training.packBins]]
    * exchange), one id-keyed reassembly aggregate. Output per document
    * with ≥ 1 word: the clipped canonical text, `n_tokens_bpe` (post-clip
    * ≤ maxTokens), `n_tokens_full`, and the `truncated` flag; wordless
    * (NULL/empty) documents are absent, as everywhere tokens are used.
    * A document whose FIRST word alone exceeds the budget clips to the
    * empty string with `n_tokens_bpe = 0` — the caller decides whether to
    * drop it (the C4 empty-survivor rule).
    */
  def truncateTokensBpe(
      docs: DataFrame, idCol: String, textCol: String, dict: DataFrame,
      merges: Seq[BpeMerge], maxTokens: Long): DataFrame = {
    require(maxTokens >= 1L, "token budget must be >= 1")
    val words = docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\\s+")).as(Seq("__pos", "word")))
      .filter(length(col("word")) > 0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val cum = words.join(wordSizes(words, dict, merges), Seq("word"))
      .withColumn("__cum", sum(col("__sz")).over(w))
    // ONE aggregate computes the kept prefix AND the full total
    // (conditional aggregates over the running sum; collect_list skips
    // the over-budget rows' NULLs) — two aggregates joined would run the
    // posexplode + broadcast join + window subtree twice (code-review
    // r13 #5)
    val admitted = col("__cum") <= maxTokens
    cum.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(admitted, struct(col("__pos"), col("word"))))),
            x => x.getField("word")),
          " ").as("__text"),
        coalesce(sum(when(admitted, col("__sz"))), lit(0L)).as("__n_kept"),
        max(col("__cum")).as("__total"))
      .select(
        col(idCol),
        col("__text").as(textCol),
        col("__n_kept").as("n_tokens_bpe"),
        col("__total").as("n_tokens_full"),
        (col("__total") > maxTokens).as("truncated"))
  }

  /** Learn up to `nMerges` merges from the corpus; returns the merge
    * sequence and the final dict (word, cnt, syms) — the latter IS the
    * learned segmentation of every corpus word. Stops early when no
    * adjacent pair remains (every word fully merged).
    *
    * '''Batched rounds.''' Each round selects up to `maxPerRound` merges
    * from the frequency-ranked candidate list: walk the ranked prefix in
    * order, selecting candidates whose symbols are DISJOINT from every
    * symbol already selected this round, and STOP at the first candidate
    * that conflicts. Disjointness makes the batch order-independent — a
    * selected merge cannot create, destroy, or recount another selected
    * merge's pair — and stopping at the first conflict (rather than
    * skipping past it) preserves chain formation: the pair a merge
    * creates (e.g. `es`+`t` after `e`+`s`) only competes from the next
    * round, exactly as in one-at-a-time training, so chains like
    * es→est→est</w> serialize while unrelated high-frequency merges
    * batch. Stated deviation from strictly sequential BPE: a pair
    * CREATED by one of the round's merges only enters the candidate list
    * next round, so where such a pair would have outranked (by frequency
    * or by tie-break) a later merge of the same round, the batched
    * sequence differs — the standard batched-trainer trade
    * (`maxPerRound = 1` restores exact sequential semantics; BpeSpec
    * pins both). One round = 2 tiny jobs instead of one PER MERGE: a
    * 32k-entry vocabulary trains in hundreds of driver round-trips, not
    * tens of thousands.
    */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxPerRound: Int = 8): (Seq[BpeMerge], DataFrame) = {
    require(nMerges >= 1, "need at least one merge")
    require(maxPerRound >= 1, "need at least one merge per round")
    var dict = wordDict(docs, textCol)
      .select(col("word"), col("cnt"), initSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var round = 0
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      round += 1
      val budget = math.min(maxPerRound, nMerges - merges.size)
      // scan enough ranked rows to fill the budget; the walk stops at the
      // first conflict anyway, so a bounded head is all the driver sees
      val ranked = pairFreqs(dict)
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(math.max(budget * 4, 16)).collect()
      if (ranked.isEmpty) exhausted = true
      else {
        val taken = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var halted = false
        val it = ranked.iterator
        while (!halted && batch.size < budget && it.hasNext) {
          val r = it.next()
          val (l, rr, f) = (r.getString(0), r.getString(1), r.getLong(2))
          if (taken(l) || taken(rr)) halted = true // stop-at-conflict: chains serialize
          else { taken += l; taken += rr; batch += ((l, rr, f)) }
        }
        batch.foreach { case (l, rr, f) =>
          merges += BpeMerge(merges.size + 1, l, rr, l + rr, f, round)
        }
        val prev = dict
        dict = dict.withColumn("syms",
            batch.foldLeft(col("syms"))((s, m) => applyMerge(s, m._1, m._2)))
          .localCheckpoint()
        prev.unpersist() // free the previous round's checkpoint storage (the CC-loop rule)
      }
    }
    (merges.toSeq, dict)
  }
}
