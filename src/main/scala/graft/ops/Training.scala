package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline primitives: deterministic dataset splits,
  * stratified sampling, sequence packing, context-window chunking, and
  * train/test decontamination — the curation steps between "deduped corpus"
  * (see [[Dedup]] / [[TextStats]]) and "tensors on a trainer".
  *
  * Two design rules, both load-bearing at 100 TB:
  *
  *  - '''Hash-derived randomness, never RNG state.''' Every "random" choice
  *    (split assignment, sample keep/drop, shard routing) is a pure function
  *    of a stable row id via an md5-hex prefix. That makes the operators
  *    map-only (no shuffle to seed/synchronize anything), re-runnable with
  *    byte-identical output after any repartition/retry (Spark task retries
  *    replay `rand()` with a per-partition seed — resplitting the input
  *    silently reshuffles such samples), and portable: the DuckDB oracle
  *    twins replay the exact same bits. Thresholds compare 8-hex-digit
  *    prefixes as strings, so no engine-specific hex→int conversion is
  *    involved.
  *  - '''Shard-local, not global, sequencing.''' Anything that needs an
  *    ordering (packing bins) partitions by a hash shard first and orders
  *    within the shard — a partitioned window, never a global one (a global
  *    ordering is a single-task bottleneck at any real scale).
  */
object Training {

  /** Lowercase 8-hex-digit threshold for fraction `f` of the 32-bit hash
    * space: a row whose [[hashHex]] compares `<` the threshold falls in the
    * first `f` of the space (within 2⁻³²). `f >= 1` returns `"g"`, which is
    * lexicographically above every hex string, so it keeps everything.
    */
  def hexThreshold(f: Double): String =
    if (f >= 1.0) "g"
    else if (f <= 0.0) "00000000"
    else f"${(f * 4294967296.0).toLong}%08x"

  /** The row's uniform hash handle: first `hexChars` hex chars of
    * md5("seed:id") — 8 for thresholds, 1–4 for shard routing.
    */
  def hashHex(id: Column, seed: String, hexChars: Int = 8): Column =
    substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, hexChars)

  /** SQL twin of [[hashHex]] (DuckDB dialect), for oracle generation. */
  def hashHexSql(idExpr: String, seed: String, hexChars: Int = 8): String =
    s"substr(md5('$seed:' || CAST($idExpr AS VARCHAR)), 1, $hexChars)"

  /** Deterministic train/val/test split label for a row id. Map-only: the
    * label is a pure function of the id, so the split survives reshuffles,
    * reruns, and engine changes; fractions are honored to within 2⁻³² per
    * boundary. The LAST entry is the catch-all (no floating-point edge at
    * the top of the range). Fractions must sum to 1.
    */
  def splitColumn(
      id: Column, fractions: Seq[(String, Double)], seed: String = "graft-split"): Column = {
    require(fractions.size >= 2, "need at least two split labels")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val h = hashHex(id, seed)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.init.zip(cum.init).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), c), els) => when(h < lit(hexThreshold(c)), lit(name)).otherwise(els)
    }
  }

  /** SQL twin of [[splitColumn]] — generated from the same fractions and
    * the same thresholds, so the oracle can never drift from the Scala
    * semantics (the q27 generated-dictionary pattern).
    */
  def splitSql(
      idExpr: String, fractions: Seq[(String, Double)], seed: String = "graft-split"): String = {
    val h = hashHexSql(idExpr, seed)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val whens = fractions.init.zip(cum.init)
      .map { case ((name, _), c) => s"WHEN $h < '${hexThreshold(c)}' THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${fractions.last._1}' END"
  }

  /** Stratified sampling predicate: keep a row iff its hash handle falls
    * under its stratum's rate threshold (`defaultRate` for labels not in
    * `rates`). Map-only — at 100 TB this samples with NO shuffle, no
    * stratum-size pre-pass, and no RNG/partition coupling; expected stratum
    * sizes are rate × stratum count, exact membership is reproducible.
    * (An exact-count stratified sample needs a per-stratum top-k by hash —
    * compose [[hashHex]] with the q05 windowed top-k when counts must be
    * exact rather than expected.)
    */
  def stratifiedKeep(
      id: Column, label: Column, rates: Map[String, Double],
      defaultRate: Double = 0.0, seed: String = "graft-strat"): Column = {
    val thr = rates.toSeq.sortBy(_._1).foldRight(lit(hexThreshold(defaultRate)): Column) {
      case ((lbl, r), els) => when(label === lbl, lit(hexThreshold(r))).otherwise(els)
    }
    hashHex(id, seed) < thr
  }

  /** SQL twin of [[stratifiedKeep]]. An empty `rates` map emits the bare
    * default threshold (a `CASE` with no WHEN arms is a syntax error in
    * DuckDB, while the Scala twin folds to the plain default — ADVICE r6).
    */
  def stratifiedKeepSql(
      idExpr: String, labelExpr: String, rates: Map[String, Double],
      defaultRate: Double = 0.0, seed: String = "graft-strat"): String = {
    val thr =
      if (rates.isEmpty) s"'${hexThreshold(defaultRate)}'"
      else {
        val whens = rates.toSeq.sortBy(_._1)
          .map { case (lbl, r) => s"WHEN $labelExpr = '$lbl' THEN '${hexThreshold(r)}'" }
          .mkString(" ")
        s"(CASE $whens ELSE '${hexThreshold(defaultRate)}' END)"
      }
    s"${hashHexSql(idExpr, seed)} < $thr"
  }

  /** EXACT-count stratified sample: per stratum keep exactly
    * `counts(label)` rows — the ones with the smallest hash handles
    * (deterministic id tie-break) — or the whole stratum when it is
    * smaller. Labels absent from `counts` keep `defaultCount` rows.
    *
    * [[stratifiedKeep]] stays the 100 TB default (map-only, expected-size);
    * this is its windowed sibling for when counts must be exact: ONE
    * shuffle keyed on the stratum label, and the rank filter keeps the
    * `rn <= maxCount` conjunct so Spark plans a WindowGroupLimit — each
    * map task forwards at most maxCount rows per stratum into the shuffle
    * instead of the full stratum (PlanSpec pins both properties).
    * Membership is still a pure function of the id SET: re-runs and
    * reshuffles reproduce the same sample; row additions only perturb
    * strata they hash under the cut of.
    */
  def stratifiedExact(
      df: DataFrame, idCol: String, labelCol: String,
      counts: Map[String, Long], defaultCount: Long = 0L,
      seed: String = "graft-strat-exact"): DataFrame = {
    require(counts.values.forall(_ >= 0) && defaultCount >= 0, "counts must be >= 0")
    val w = Window.partitionBy(col(labelCol))
      .orderBy(hashHex(col(idCol), seed), col(idCol))
    val kExpr = counts.toSeq.sortBy(_._1).foldRight(lit(defaultCount): Column) {
      case ((lbl, k), els) => when(col(labelCol) === lbl, lit(k)).otherwise(els)
    }
    val maxK = (counts.values.toSeq :+ defaultCount).max
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(maxK) && col("__rn") <= kExpr)
      .drop("__rn")
  }

  /** SQL twin of [[stratifiedExact]] — a WHERE predicate against a relation
    * that already carries `row_number() OVER (PARTITION BY label ORDER BY
    * <hashHexSql(id, seed)>, id)` as `rn` (the CASE is generated from the
    * same counts map, the q27 pattern).
    */
  def stratifiedExactSql(
      labelExpr: String, counts: Map[String, Long], defaultCount: Long = 0L): String =
    if (counts.isEmpty) s"rn <= $defaultCount"
    else {
      val whens = counts.toSeq.sortBy(_._1)
        .map { case (lbl, k) => s"WHEN $labelExpr = '$lbl' THEN $k" }
        .mkString(" ")
      s"rn <= (CASE $whens ELSE $defaultCount END)"
    }

  /** Greedy sequential sequence packing, shard-local: route each document
    * to one of 16^`shardHexChars` hash shards, order within the shard by id,
    * and assign bin = floor(start_offset / budget) where start_offset is the
    * running token count before the document. Documents longer than the
    * budget simply span bins (chunk first with [[chunkTokens]] when bins
    * must be ≤ budget exactly).
    *
    * Scale shape: ONE hash-partitioned window per shard — embarrassingly
    * parallel across shards, never a global ordering. The gate query runs
    * 16 shards (sf0.01); at 100 TB raise `shardHexChars` to 3–4 (4k–65k
    * shards) so each shard's window fits an executor. Packing quality is
    * unaffected by shard count: every bin except possibly the last per
    * shard is ≥ budget − max_doc_tokens full.
    */
  def packBins(
      docs: DataFrame, idCol: String, tokensCol: String, budget: Long,
      shardHexChars: Int = 1, seed: String = "graft-pack",
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0 && shardHexChars >= 1 && shardHexChars <= 8)
    val shard = hashHex(col(idCol), seed, shardHexChars)
    // extra partition columns (e.g. the split label) pack independent
    // streams without interleaving — bins never span a split boundary
    val w = Window.partitionBy(partitionCols.map(col) :+ col("shard"): _*)
      .orderBy(col(idCol))
    docs
      .withColumn("shard", shard)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokensCol)) / lit(budget)).cast("long"))
  }

  /** Fixed-size context-window chunking: split each document's token stream
    * into windows of `chunkSize` tokens starting every `stride` tokens
    * (stride = chunkSize → disjoint; stride < chunkSize → overlapping). Map-side
    * explode — one pass, no shuffle; the natural pre-step before
    * [[packBins]] when hard ≤-budget bins are required, and the unit LLM
    * pretraining corpora are actually fed in.
    *
    * Output: (id, chunk_start [1-based token offset], chunk_tokens,
    * chunk_text). NULL texts produce no chunks; an empty-string text is one
    * single-token chunk (tokenization is the engine-wide whitespace split,
    * identical to [[TextStats.tokenCount]] and the q22 oracle).
    */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1)
    val toks = split(lower(regexp_replace(col(textCol), "\\s+", " ")), " ")
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(col("__toks").isNotNull)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(stride)))
          .as("chunk_start"))
      .select(
        col(idCol),
        col("chunk_start"),
        slice(col("__toks"), col("chunk_start"), lit(chunkSize)).as("__chunk"))
      .select(
        col(idCol),
        col("chunk_start"),
        size(col("__chunk")).as("chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Train/test contamination pairs: (test doc, train doc) sharing at least
    * `minShared` distinct word shingles — the decontamination check every
    * benchmark-respecting pretraining pipeline runs before training.
    * `shingles` is the [[Dedup.wordShingles]] inverted index; `split` must
    * be a pure function of the id column (e.g. [[splitColumn]]), so split
    * routing adds NO join — each shingle row classifies itself.
    *
    * Scale shape: same as [[Dedup.jaccardPairs]] — an equi-join keyed on
    * the shingle, cost bounded by per-shingle document frequency, never an
    * all-pairs product. The same DF-cap guard applies: `maxShingleDf`
    * drops hot stop-shingles (a boilerplate shingle in d docs contributes
    * up to d²/4 test×train rows), `capAtObservedMax` derives a
    * never-prunes cap in-job so exact-oracle gates keep the pruning path
    * exercised.
    */
  def contaminationPairs(
      shingles: DataFrame, idCol: String, split: Column,
      trainLabel: String = "train", testLabel: String = "test",
      minShared: Long = 2L,
      maxShingleDf: Option[Long] = None,
      capAtObservedMax: Boolean = false): DataFrame = {
    val tagged = Dedup.cappedShingles(shingles, maxShingleDf, capAtObservedMax)
      .withColumn("__split", split)
    val test = tagged.filter(col("__split") === testLabel)
      .select(col(idCol).as("test_id"), col("shingle"))
    val train = tagged.filter(col("__split") === trainLabel)
      .select(col(idCol).as("train_id"), col("shingle"))
    test.join(train, "shingle")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The drop list decontamination actually executes: every train doc
    * contaminated by ≥ `minShared` shared shingles with ANY test doc,
    * with per-doc blast-radius stats (how many test docs it leaks, worst
    * overlap). `train_corpus.join(drop_list, "left_anti")` is the
    * pipeline's next line. Same scale shape as [[contaminationPairs]] —
    * the extra aggregate is keyed on train_id (map-side combinable).
    */
  def contaminatedTrainDocs(
      shingles: DataFrame, idCol: String, split: Column,
      trainLabel: String = "train", testLabel: String = "test",
      minShared: Long = 2L,
      maxShingleDf: Option[Long] = None,
      capAtObservedMax: Boolean = false): DataFrame =
    contaminationPairs(shingles, idCol, split, trainLabel, testLabel, minShared,
        maxShingleDf, capAtObservedMax)
      .groupBy(col("train_id"))
      .agg(
        countDistinct(col("test_id")).as("n_test_docs"),
        max(col("n_shared")).as("worst_overlap"))
}
