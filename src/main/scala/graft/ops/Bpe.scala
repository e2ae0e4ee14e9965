package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) — the
  * subword-vocabulary step of a training-data pipeline, where
  * [[TextStats.subwordCountEstimate]] is only a counting heuristic.
  *
  * Scale shape (the classic one, and the reason BPE trains fast at any
  * corpus size): merges operate on the WORD-FREQUENCY DICTIONARY, not the
  * corpus. One corpus scan builds (word, count) — a single map-side
  * combinable aggregate whose output is the distinct-word set (Zipf: a few
  * million rows at 100 TB, corpus-size-independent). Each merge round is
  * then two tiny jobs over the dict (the Lloyd's-iteration shape of
  * [[Clustering.lloyd]]):
  *
  *  1. pair counts — adjacent-symbol pairs weighted by word count, one
  *     map-side-combinable aggregate;
  *  2. the argmax pair — `orderBy(freq desc).limit(1)`, a
  *     TakeOrderedAndProject collecting ONE row to the driver;
  *
  * followed by a map-only rewrite of the dict's symbol arrays. The dict is
  * re-checkpointed per round so lineage stays flat across hundreds of
  * merges. Nothing in the loop grows with corpus size, and the only
  * driver-side data is one (pair, freq) row per merge.
  *
  * Determinism: ties on pair frequency break lexicographically on
  * (lhs, rhs), so the learned merge sequence is a pure function of the
  * corpus — reshuffle/rerun/engine stable, which is what lets the q119
  * gate replay the merge order closed-form.
  */
object Bpe {

  /** End-of-word marker symbol, appended to every word's symbol sequence
    * (Sennrich's `</w>`): merges crossing the marker learn word-final
    * subwords distinct from word-internal ones.
    */
  val EndMark = "_"

  /** One learned merge: at `step`, the corpus's most frequent adjacent
    * symbol pair (lhs, rhs) with weight `freq` became token `merged`.
    */
  final case class BpeMerge(step: Int, lhs: String, rhs: String, merged: String, freq: Long)

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

  /** Per-document TOKEN COUNTS under a trained vocabulary — the number
    * the packing budget ([[Training.packBins]]) and per-language fertility
    * stats actually consume, replacing [[TextStats.subwordCountEstimate]]'s
    * regex heuristic once a vocabulary exists. Corpus words broadcast-join
    * the (word → |syms|) dictionary (Zipf-sized, the same reason training
    * is dict-side); the scan stays map-local. OOV policy, stated: a word
    * absent from the dict counts `length + 1` tokens (its character
    * segmentation with the end marker — the floor any merge sequence
    * starts from; exact OOV segmentation would re-run the merges per
    * word, a per-query cost that belongs in a tokenizer service, not a
    * counting scan). Returns (idCol, n_tokens).
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

  /** Learn up to `nMerges` merges from the corpus; returns the merge
    * sequence and the final dict (word, cnt, syms) — the latter IS the
    * learned segmentation of every corpus word. Stops early when no
    * adjacent pair remains (every word fully merged).
    */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int): (Seq[BpeMerge], DataFrame) = {
    require(nMerges >= 1, "need at least one merge")
    var dict = wordDict(docs, textCol)
      .select(col("word"), col("cnt"), initSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pairFreqs(dict)
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += BpeMerge(step, l, r, l + r, f)
        val prev = dict
        dict = dict.withColumn("syms", applyMerge(col("syms"), l, r)).localCheckpoint()
        prev.unpersist() // free the previous round's checkpoint storage (the CC-loop rule)
        step += 1
      }
    }
    (merges.toSeq, dict)
  }
}
