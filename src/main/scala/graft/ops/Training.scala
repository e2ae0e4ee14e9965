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

  /** TOP-FRACTION cut per group: keep each group's best `frac` of rows by
    * `scoreCol` — the FineWeb/C4-style "keep the best 30% per source by
    * quality" gate, with EXACT per-group counts (`ceil(frac · n)`, so a
    * non-empty group always keeps ≥ 1 row) rather than a global score
    * threshold, which over-prunes weak sources and under-prunes strong
    * ones. Deterministic: ties rank by id.
    *
    * Scale shape: ONE shuffle keyed on the group — the rank window and
    * the per-group count window share the same partitioning, so Catalyst
    * plans a single exchange (TrainingSpec pins it). NOTE: unlike the
    * fixed-count [[stratifiedExact]], the rank bound here is
    * `ceil(frac·n)` — data-dependent, so WindowGroupLimit pushdown does
    * NOT apply and every group member crosses the one shuffle; when the
    * keep-count is known up front, prefer the fixed-count form.
    * Membership is a pure function of (group, score, id): re-runs and
    * reshuffles reproduce the same cut.
    */
  def topFractionPerGroup(
      df: DataFrame, idCol: String, groupCol: String, scoreCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"fraction must be in (0, 1], got $frac")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .drop("__rn", "__n")
  }

  /** TOKEN-BUDGET TRUNCATION: clip each document to its first `maxTokens`
    * canonical tokens — the context-length guard every tokenize-and-pack
    * pipeline applies before packing (a 2M-token outlier otherwise owns a
    * whole pack bin, see [[packBins]]). Map-side only (slice of the
    * scan-local token array + rejoin); emits the clipped text, the
    * original count, and a `truncated` flag so downstream accounting
    * stays honest. Already-short documents pass through with their text
    * REBUILT FROM THE SAME TOKENS (canonical whitespace), so the output
    * column is uniformly canonical either way.
    */
  def truncateTokens(
      df: DataFrame, textCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "token budget must be >= 1")
    val toks = TextStats.tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("truncated", col("n_tokens") > maxTokens)
      .withColumn(textCol,
        array_join(slice(toks, 1, maxTokens), " "))
  }

  /** WEIGHTED sample WITHOUT replacement (Efraimidis–Spirakis 2006):
    * draw `n` rows with inclusion probability proportional to
    * `weightCol`, deterministically — key_i = ln(u_i)/w_i with u_i the
    * portable-hash uniform of the id, and the n LARGEST keys form
    * exactly a weight-proportional without-replacement draw (the paper's
    * u^(1/w) rule under the monotone ln transform, which avoids `pow`).
    * The quality-weighted / length-weighted corpus draw every curation
    * mixture needs, and the same determinism contract as the rest of the
    * sampling battery: a pure function of (id, weight, seed), so reruns,
    * reshuffles, and the DuckDB oracle reproduce the identical sample.
    *
    * Scale shape: key assignment is map-side; the top-n is one
    * TakeOrderedAndProject (the q09 rule — never a global sort). Rows
    * with non-positive or null weight are excluded, as un-sampleable.
    * 13 hash hex chars = 52 uniform bits, exactly representable in a
    * double; the +1 keeps u in (0, 1] so ln never sees zero.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, n: Int,
      seed: String = "graft-es"): DataFrame = {
    require(n >= 0, "sample size must be >= 0")
    val u = (conv(substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double") + lit(1.0)) / lit(4503599627370497.0) // 2^52 + 1
    df.filter(col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(n)
      .drop("__es_key")
  }

  /** SQL twin of [[weightedSample]]'s key (DuckDB dialect) — same hash
    * bits, same +1/2⁵²+1 uniform, same ln/weight transform.
    */
  def weightedSampleKeySql(
      idExpr: String, weightExpr: String, seed: String = "graft-es"): String =
    s"""ln(((('0x' || substr(md5('$seed:' || CAST($idExpr AS VARCHAR)), 1, 13))::BIGINT) + 1.0)
      / 4503599627370497.0) / CAST($weightExpr AS DOUBLE)"""

  /** Per-stratum temperature-sampling rates — the multilingual/multi-source
    * mixture rebalancing every large pretraining corpus applies (sample
    * stratum d with probability ∝ p_d^α relative to its natural share,
    * downsample-only): `rate_d = (n_min / n_d)^(1−α)`, so the smallest
    * stratum keeps everything and the post-sample distribution follows
    * p^α. α = 1 reproduces the natural mixture; α → 0 flattens it.
    *
    * Returns one row per label: (label, n_docs, rate, thr) where `thr` is
    * the 32-bit hash threshold `floor(rate · 2³²)` — feed it to
    * [[temperatureKeep]] for the map-only sampling pass.
    *
    * Cross-engine bit-stability: α = 0.5 (the common choice) computes the
    * rate as `sqrt`, which IEEE-754 rounds correctly in every engine — the
    * q91 oracle replays it bit-for-bit. Other α go through `pow`, whose
    * last-ulp behavior is libm-specific; those rates are engine-local
    * (document or round before persisting them).
    *
    * Scale shape: the counts aggregate is map-side combinable and its
    * output is |labels| rows; the min is a 1-row broadcast scalar
    * subquery joined back in-job (the q24 cap pattern — no driver-side
    * action). Sampling then needs a second pass over the corpus, which is
    * inherent: the rates are a function of the GLOBAL stratum counts (at
    * 100 TB, reuse rates from the previous corpus snapshot to fold the
    * two passes into one).
    */
  def temperatureRates(
      df: DataFrame, labelCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n_docs"))
    val minFrame = counts.agg(min(col("n_docs")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_docs").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    counts.crossJoin(broadcast(minFrame))
      .withColumn("rate", rate)
      .withColumn("thr", floor(col("rate") * lit(4294967296.0)).cast("long"))
      .drop("n_min")
  }

  /** Mixture EPOCHS for a token budget — the UP-sampling complement of
    * [[temperatureRates]]' rate-based down-sampling, and the recipe step
    * behind published pretraining mixture tables (a source with a high
    * mixture weight but little data is REPEATED across the run): given
    * caller-owned per-source weights and a budget of `budgetFactor` ×
    * the observed corpus token mass, each source's target mass is
    * weight · budget and its epoch count (repeat factor) is
    * target / available. `over_cap` flags sources whose repeats exceed
    * `maxEpochs` — the data-constrained regime where repeated tokens
    * stop helping (Muennighoff et al. 2023 put the knee near 4 epochs);
    * the planner's move there is lowering the weight, not more repeats.
    *
    * Scale shape: ONE map-side-combinable per-source aggregate (|sources|
    * rows); the corpus total is a 1-row broadcast scalar subquery (the
    * q24 cap pattern) and the weights broadcast as a literal frame.
    * Integer token sums are exact, so every derived double is a fixed
    * IEEE expression of exact inputs — full hash oracle. Sources absent
    * from `weights` are excluded (the mixture DEFINES the corpus).
    */
  def mixtureEpochs(
      docs: DataFrame, srcCol: String, tokenCol: String,
      weights: Map[String, Double], budgetFactor: Double,
      maxEpochs: Double = 2.0): DataFrame = {
    require(budgetFactor > 0 && maxEpochs > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val perSrc = docs.groupBy(col(srcCol))
      .agg(sum(col(tokenCol)).cast("long").as("tokens"))
    val inMix = perSrc.join(broadcast(weights.toSeq.toDF(srcCol, "weight")), Seq(srcCol))
    // corpus mass over the MIXTURE's sources only — budget and weights
    // describe the same universe
    val total = inMix.agg(sum(col("tokens")).cast("long").as("__total"))
    inMix
      .crossJoin(broadcast(total))
      .withColumn("target_tokens",
        round(col("weight") * lit(budgetFactor) * col("__total").cast("double"), 4))
      .withColumn("epochs",
        round(col("weight") * lit(budgetFactor) * col("__total").cast("double") /
          col("tokens").cast("double"), 4))
      .withColumn("over_cap", col("epochs") > lit(maxEpochs))
      .select(col(srcCol), col("tokens"), col("weight"),
        col("target_tokens"), col("epochs"), col("over_cap"))
  }

  /** The sampling predicate paired with [[temperatureRates]]: keep a row
    * iff its portable 32-bit hash falls under its stratum's `thr`. The
    * rates frame broadcasts (|labels| rows), so the pass is map-only.
    */
  def temperatureKeep(
      docs: DataFrame, idCol: String, labelCol: String, rates: DataFrame,
      seed: String = "graft-mix"): DataFrame =
    docs.join(broadcast(rates.select(col(labelCol), col("thr"))), labelCol)
      .filter(Dedup.portableHash(col(idCol).cast("string"), s"$seed:") < col("thr"))
      .drop("thr")

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

  /** [[packBins]] driven by TRUE BPE token counts (r13 verdict #3 → r15):
    * the packing budget is a MODEL CONTEXT budget, and a context is
    * measured in tokenizer tokens, not whitespace words — a word is ≥ 1
    * BPE token and usually several, so a packing run sized on whitespace
    * counts silently overfills real context windows by a multiple (the
    * q190 truncation claim, applied to packing; q198 gates both routes
    * side by side). Counts come from [[Bpe.tokenCountsExact]] — the true
    * learned segmentation for in-dictionary AND OOV words — then the bins
    * assign exactly as [[packBins]] (same shards, same floor rule, same
    * straddler caveat: chunk first for hard ≤-budget bins). Output =
    * [[packBins]]'s columns over the docs frame plus `n_tokens` (the BPE
    * count packing ran on); wordless docs are absent, as everywhere
    * tokens are used.
    */
  def packBinsBpe(
      docs: DataFrame, idCol: String, textCol: String,
      dict: DataFrame, merges: Seq[Bpe.BpeMerge], budget: Long,
      shardHexChars: Int = 1, seed: String = "graft-pack",
      partitionCols: Seq[String] = Nil): DataFrame =
    packBins(
      docs.join(Bpe.tokenCountsExact(docs, idCol, textCol, dict, merges), Seq(idCol)),
      idCol, "n_tokens", budget, shardHexChars, seed, partitionCols)

  /** Packing-efficiency datasheet — the trainer-facing report over
    * [[packBins]] output: per (partition…, shard), bin count, item count,
    * token mass, worst bin, how many bins exceed the budget (possible by
    * construction — [[packBins]] starts a new bin when the RUNNING sum
    * crosses the budget, so a large item can overshoot its bin; chunk
    * first via [[chunkTokens]] when hard ≤-budget bins are required — and
    * this datasheet is exactly the check that the chunk step was sized
    * right), and the fill rate against n_bins × budget. Two map-side
    * combinable aggregates (bins, then shards); |shards| rows out; exact
    * integer counts, one rounded division (q79's rule).
    */
  def packingStats(
      packed: DataFrame, tokensCol: String, budget: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0)
    val keys = partitionCols :+ "shard"
    val bins = packed
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(col(tokensCol)).cast("long").as("__tok"))
    bins
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_bins"),
        sum(col("__n")).cast("long").as("n_items"),
        sum(col("__tok")).cast("long").as("total_tokens"),
        max(col("__tok")).as("max_bin_tokens"),
        sum(when(col("__tok") > lit(budget), 1L).otherwise(0L)).as("n_over_budget"),
        round(
          sum(col("__tok")).cast("double") /
            (count(lit(1)) * lit(budget)).cast("double"), 4).as("fill_rate"))
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

  /** Cross-document REPEATED SPANS: `spanTokens`-token windows that occur
    * verbatim in more than one document — window-granular exact-substring
    * dedup, the scalable approximation of suffix-array passage dedup
    * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better"; exact coverage of every repeated substring needs suffix
    * automata, out of scope).
    *
    * Windows are taken at EVERY token position (the native `word_shingles`
    * pass), then thinned by a CONTENT-DEFINED anchor rule: a window
    * survives iff the integer prefix of its own fingerprint ≡ 0
    * (mod `anchorMod`). Content-defined — not a stride grid — because a
    * fixed grid only detects repeats whose offsets agree modulo the
    * stride: two docs sharing a passage at different alignments sample
    * DIFFERENT windows from it and never collide. Anchoring by window
    * content picks the SAME windows of the shared passage in every
    * document regardless of offset (the winnowing / content-defined-
    * chunking idea), so a shared passage of L ≥ spanTokens tokens is
    * missed with probability (1 − 1/anchorMod)^(L − spanTokens + 1) —
    * e.g. < 2% for a 2×spanTokens passage at the defaults — and every
    * detection is an exact verbatim repeat (no false positives at all,
    * modulo md5).
    *
    * Emits one row per repeated span fingerprint: (span_fp, n_docs,
    * n_occurrences, first_doc). Downstream, a pipeline joins the
    * fingerprints back to the window stream to mask/cut the passages.
    *
    * Scale shape: explode + fingerprint + anchor filter are scan-local;
    * only ~1/anchorMod of windows (16-byte fps) reach the single
    * map-side-combinable aggregate; no document ever compares against
    * another directly.
    */
  /** The content-anchored window stream both span operators consume:
    * (id, span_fp) for every `spanTokens`-window whose fingerprint prefix
    * ≡ 0 (mod `anchorMod`). Scan-local: explode + md5 + anchor filter all
    * run inside the scan stage.
    */
  private[ops] def anchoredWindows(
      docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, anchorMod: Int): DataFrame = {
    require(spanTokens >= 1 && anchorMod >= 1)
    val win = explode(
      graft.functions.WordShinglesExpr.word_shingles(col(textCol), lit(spanTokens)))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), win.as("span"))
      .select(col(idCol), substring(md5(col("span")), 1, 16).as("span_fp"))
      .filter(conv(substring(col("span_fp"), 1, 8), 16, 10).cast("long")
        % anchorMod === 0)
  }

  def repeatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 24, anchorMod: Int = 8): DataFrame =
    anchoredWindows(docs, idCol, textCol, spanTokens, anchorMod)
      .groupBy(col("span_fp"))
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") > 1)

  /** The CONSUMER of [[repeatedSpans]]: per-document blast radius of
    * cross-corpus repetition — how many of the doc's anchored windows are
    * passages shared with other documents, and what fraction. The frame a
    * curation pipeline thresholds to drop boilerplate-heavy documents
    * (the Gopher-style doc-level repetition rules in
    * [[TextStats.repetitionStats]] catch WITHIN-doc loops; this catches
    * ACROSS-doc boilerplate — headers, licenses, templated pages).
    *
    * `repeated_frac` is one double division of two exact counts —
    * bit-stable cross-engine. Only documents with ≥ 1 anchored window
    * appear (shorter docs have no windows to judge).
    *
    * Scale shape: the window stream is scan-local; the fp-keyed span
    * aggregate and the doc-keyed stats aggregate are the only shuffles,
    * both map-side combinable. The repeated-fp set joins back on the fp
    * equi-key (its size is the number of DISTINCT repeated passages —
    * small relative to the corpus; broadcastable when it fits, and AQE
    * decides per run).
    */
  def repeatedSpanStats(
      docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 24, anchorMod: Int = 8): DataFrame = {
    val windows = anchoredWindows(docs, idCol, textCol, spanTokens, anchorMod)
    val repeated = repeatedSpans(docs, idCol, textCol, spanTokens, anchorMod)
      .select(col("span_fp"), lit(1L).as("__rep"))
    windows.join(repeated, Seq("span_fp"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("__rep"), lit(0L))).as("n_repeated"),
        (sum(coalesce(col("__rep"), lit(0L))).cast("double") / count(lit(1)))
          .as("repeated_frac"))
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
    // 16-byte two-long [[Dedup.shingleKeyExprs]] instead of the shingle
    // string through the DF-cap groupBy and the test×train equi-join
    // (guide §2.3): only equality is consumed downstream — exact at any
    // corpus scale (r20, same argument as [[Dedup.overlapPairs]]),
    // proven by the exact oracles staying green.
    val tagged = Dedup.cappedShingles(
        shingles.select(
          col(idCol) +: Dedup.shingleKeyExprs(col("shingle")) :+ split.as("__split"): _*),
        maxShingleDf, capAtObservedMax)
    val test = tagged.filter(col("__split") === testLabel)
      .select(col(idCol).as("test_id") +: Dedup.ShingleKeyCols.map(col): _*)
    val train = tagged.filter(col("__split") === trainLabel)
      .select(col(idCol).as("train_id") +: Dedup.ShingleKeyCols.map(col): _*)
    test.join(train, Dedup.ShingleKeyCols)
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

  /** Per-document TARGET-AFFINITY score — the data-selection signal of
    * DSIR (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"), in an exact-arithmetic form: score each
    * candidate document by how much its token mass concentrates in the
    * vocabulary of a TARGET subcorpus (the high-quality / in-domain slice
    * you want more of).
    *
    * For each token occurrence t in a doc, let c_tgt(t) / c_all(t) be that
    * token's occurrence counts in the target slice and the whole corpus.
    * The score is `affinity = Σ c_tgt(t) / Σ c_all(t)` — the target's
    * share of the corpus-wide mass of this document's tokens. A doc made
    * of target-distinctive vocabulary scores near 1, one made of tokens
    * the target never uses scores 0, and uniform filler lands at the
    * target's global mass share. (DSIR proper scores Σ log-ratios of
    * hashed-ngram probabilities; a sum of logs is FP-order-dependent and
    * engine-specific, so this operator keeps the ranking signal as a ratio
    * of two exact integer sums — ONE correctly-rounded double division,
    * bit-stable in any IEEE engine, q79's rule — and is hash-gatable.)
    *
    * Scale shape: tokenization is scan-local (the engine-wide whitespace
    * split, q22's); the vocabulary count is one map-side-combinable
    * aggregate; scoring re-joins the token stream on the token equi-key
    * (AQE broadcasts the count table when the vocabulary fits) and reduces
    * per doc. Two passes over the token stream are inherent — the scores
    * depend on GLOBAL counts; at 100 TB reuse the previous snapshot's
    * count table to fold them into one.
    */
  def targetAffinity(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column): DataFrame = {
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), isTarget.as("__tgt"),
        explode(split(lower(regexp_replace(col(textCol), "\\s+", " ")), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_tgt"))
    toks.join(counts, "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("c_tgt")).as("tgt_mass"),
        sum(col("c_all")).as("all_mass"),
        (sum(col("c_tgt")).cast("double") / sum(col("c_all"))).as("affinity"))
  }

  /** Per-document corpus NOVELTY — the fraction of a document's distinct
    * word w-shingles whose FIRST corpus occurrence (minimum id, ids being
    * acquisition order) is this document. The time-ordered complement of
    * pairwise dedup: a late crawl snapshot full of already-seen passages
    * scores near 0 even when no single earlier document is similar enough
    * to pair with it (boilerplate smeared across many sources), and the
    * score directly prices a source's marginal contribution — the
    * acquisition-planning signal behind "is another snapshot of this feed
    * worth ingesting".
    *
    * Scale shape: shingles from the codegen'd `word_shingles` scan
    * ([[Dedup.wordShingles]]); ONE shingle-keyed map-combinable `min`
    * builds the first-occurrence table; the join back is the same
    * shingle-keyed exchange (AQE broadcasts when the vocabulary side
    * fits); the final per-id aggregate is map-side combinable. Exact
    * integer counts, one correctly-rounded division (q79's rule) → full
    * hash gate. At 100 TB the first-occurrence table IS the incremental
    * artifact: score a NEW snapshot by joining its shingles against the
    * stored table ([[Dedup.exactDedupIncremental]]'s pattern), never
    * rescanning history. Documents shorter than `w` tokens have no
    * shingles and are absent, as everywhere shingles are used.
    */
  def noveltyScore(
      docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    // hash-keyed in-query (guide §2.3): the first-occurrence side is
    // derived from the SAME hashed frame, so both the min-aggregate and
    // the join back shuffle 16-byte two-long keys (128-bit exact at
    // scale, r20) — and the identical child keeps Spark's exchange reuse
    // intact. The STORED index ([[noveltyFirstIndex]]) keeps real
    // shingle strings: it is a probe-able artifact, not an in-query key.
    val sh = Dedup.wordShingles(docs, idCol, textCol, w)
      .select(col(idCol) +: Dedup.shingleKeyExprs(col("shingle")): _*)
    val first = sh.groupBy(Dedup.ShingleKeyCols.map(col): _*)
      .agg(min(col(idCol)).as("__first"))
    sh.join(first, Dedup.ShingleKeyCols)
      .groupBy(col(idCol))
      .agg(noveltyAggs(idCol).head, noveltyAggs(idCol).tail: _*)
  }

  /** The stored artifact behind incremental novelty: (shingle, first_id),
    * the minimum id ever seen per distinct shingle. Maintenance after a
    * batch is `union` + the same min — or append-only storage with
    * min-on-read — never a history rescan.
    */
  def noveltyFirstIndex(
      docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame =
    Dedup.wordShingles(docs, idCol, textCol, w)
      .groupBy(col("shingle")).agg(min(col(idCol)).as("first_id"))

  /** [[noveltyScore]] for a NEW batch against a STORED first-occurrence
    * index ([[noveltyFirstIndex]]) — the 100 TB operating mode the batch
    * operator's doc promises: history is never rescanned. The corpus-wide
    * first occurrence of a shingle is `min(stored first, batch first)`,
    * so this route returns BIT-IDENTICAL rows to running [[noveltyScore]]
    * over history ∪ batch and keeping the batch ids (q126 gates exactly
    * that equality — two routes, one answer), for any id interleaving.
    *
    * Scale shape: O(batch) shingle construction + one shingle-keyed min
    * over the batch; the index probe is a shingle-keyed equi-join (the
    * [[Dedup.exactDedupIncremental]] family — new × index, never
    * history × history).
    */
  def noveltyScoreIncremental(
      newDocs: DataFrame, idCol: String, textCol: String,
      firstIndex: DataFrame, w: Int = 3): DataFrame = {
    // both sides hashed consistently (guide §2.3) — the batch shingles
    // AND the index's key column go through the same
    // [[Dedup.shingleKeyExprs]] (128-bit exact at scale, r20), so the
    // left join matches exactly as before; the index side's values
    // (first_id) are untouched
    val sh = Dedup.wordShingles(newDocs, idCol, textCol, w)
      .select(col(idCol) +: Dedup.shingleKeyExprs(col("shingle")): _*)
    val newFirst = sh.groupBy(Dedup.ShingleKeyCols.map(col): _*)
      .agg(min(col(idCol)).as("__new_first"))
    sh.join(newFirst, Dedup.ShingleKeyCols)
      .join(firstIndex.select(
          Dedup.shingleKeyExprs(col("shingle")) :+ col("first_id").as("__old_first"): _*),
        Dedup.ShingleKeyCols, "left")
      .withColumn("__first",
        least(coalesce(col("__old_first"), col("__new_first")), col("__new_first")))
      .groupBy(col(idCol))
      .agg(noveltyAggs(idCol).head, noveltyAggs(idCol).tail: _*)
  }

  /** The shared (n_shingles, n_novel, novelty) aggregate list over a
    * shingle stream carrying `__first` — one definition, both routes. */
  private def noveltyAggs(idCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n_shingles"),
    sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"),
    round(
      sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double"), 4).as("novelty"))

  /** Per-source document quota — the C4/RefinedWeb-style domain cap that
    * stops any single site/feed from dominating a crawl-scale corpus:
    * keep at most `cap` docs per source, chosen as the source's smallest
    * hash handles (so the kept SET is a pure function of the ids present —
    * rerun/reshuffle-stable, and adding docs to a source only perturbs
    * membership near the cut). Exactly [[stratifiedExact]] with a uniform
    * quota; same one-keyed-shuffle, WindowGroupLimit-pruned scale shape.
    */
  def sourceQuota(
      df: DataFrame, idCol: String, sourceCol: String, cap: Long,
      seed: String = "graft-domain-cap"): DataFrame =
    stratifiedExact(df, idCol, sourceCol, Map.empty, cap, seed)

  /** Deterministic shard routing for training-data writes: the global
    * shuffle every trainer wants (break crawl/source locality so each
    * shard is an i.i.d.-ish sample) WITHOUT an RNG — shard =
    * portable-32-bit-hash(id) mod `nShards`, and the within-shard order
    * key is a SECOND independent hash, so shard membership and shard
    * order are both pure functions of the id (rerun-, retry-, and
    * engine-stable; the DuckDB twin replays the same bits). Map-only.
    */
  def shardColumn(id: Column, nShards: Int, seed: String = "graft-shard"): Column = {
    require(nShards >= 1)
    Dedup.portableHash(id.cast("string"), s"$seed:") % nShards
  }

  /** The order-within-shard handle paired with [[shardColumn]] (hex string;
    * compare lexicographically).
    */
  def shardOrderKey(id: Column, seed: String = "graft-shard"): Column =
    hashHex(id, s"$seed-order")

  /** SQL twin of [[shardColumn]] (DuckDB dialect) — generated from the same
    * seed/modulus so composed oracles cannot drift.
    */
  def shardSql(idExpr: String, nShards: Int, seed: String = "graft-shard"): String =
    s"('0x' || substr(md5('$seed:' || CAST($idExpr AS VARCHAR)), 1, 8))::BIGINT % $nShards"

  /** SQL twin of [[shardOrderKey]]. */
  def shardOrderKeySql(idExpr: String, seed: String = "graft-shard"): String =
    hashHexSql(idExpr, s"$seed-order")

  /** Deterministic EXACT-size global sample: the `n` rows with the
    * smallest hash handles corpus-wide (id tie-break). `orderBy().limit()`
    * plans TakeOrderedAndProject — every map task forwards only its local
    * top-n, the driver merges bounded heaps; no global sort, no
    * single-partition window (PlanSpec pins the shape). Membership is a
    * pure function of the id SET ([[stratifiedExact]]'s property with one
    * global stratum and zero label shuffle) — rerun-stable, and nested:
    * the n-sample contains the m-sample for m < n.
    */
  def globalSample(
      df: DataFrame, idCol: String, n: Int, seed: String = "graft-gsample"): DataFrame = {
    require(n >= 1)
    df.orderBy(hashHex(col(idCol), seed), col(idCol)).limit(n)
  }

  /** Per-shard manifest — the artifact a shard-writing job emits for the
    * trainer: doc count, payload size, and the shard's [first, last]
    * order-key range (what a reader needs to plan and to verify
    * completeness). ONE map-side-combinable aggregate over the map-only
    * routed stream; output is `nShards` rows.
    */
  def shardManifest(
      docs: DataFrame, idCol: String, sizeCol: String, nShards: Int,
      seed: String = "graft-shard"): DataFrame =
    docs
      .select(
        shardColumn(col(idCol), nShards, seed).as("shard"),
        col(sizeCol), shardOrderKey(col(idCol), seed).as("__ok"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        min(col("__ok")).as("first_key"),
        max(col("__ok")).as("last_key"))

  /** [[contaminatedTrainDocs]] with a broadcast BLOOM prefilter on the
    * train side — the shape that wins when the train corpus is 100 TB and
    * the test side is a benchmark suite (megabytes): build a Bloom filter
    * over the TEST shingles (one pass over the small side; ~1.2 bytes per
    * shingle at fpp 3%), then drop every train shingle the filter rejects
    * INSIDE the train scan, before the exchange. Only train shingles that
    * (probably) collide with a test shingle are shuffled into the exact
    * join — the shuffle shrinks from O(|train shingles|) to
    * O(|test shingles| · (1 + fpp·blowup)).
    *
    * The result is EXACTLY [[contaminatedTrainDocs]] (uncapped): a Bloom
    * filter has no false negatives, and its false positives are train
    * shingles with no matching test shingle — the equi-join that follows
    * eliminates them (TrainingSpec pins the equivalence; the q89 gate
    * hash-matches q86's uncapped oracle).
    *
    * Trade, stated: materializing the filter is one extra Spark action
    * over the test side at plan-build time (the same class of cost the
    * r6 q24 defect removed — but here the extra pass reads the SMALL side
    * only, and it buys removing the dominant shuffle of the big side; at
    * scale the serialized filter is also reusable across incremental
    * train batches). Spark's own runtime bloom injection (`GraftSession`)
    * does this opportunistically when stats allow; this operator
    * guarantees it.
    */
  def bloomContaminatedTrainDocs(
      shingles: DataFrame, idCol: String, split: Column,
      trainLabel: String = "train", testLabel: String = "test",
      minShared: Long = 2L,
      expectedTestShingles: Long = 1L << 16,
      fpp: Double = 0.03): DataFrame = {
    val tagged = shingles.withColumn("__split", split)
    val test = tagged.filter(col("__split") === testLabel)
      .select(col(idCol).as("test_id"), col("shingle"))
    // one action over the small (test) side; string values enter the
    // filter as UTF-8 bytes, the same bytes bloom_might_contain probes
    val bloom = test.stat.bloomFilter("shingle", expectedTestShingles, fpp)
    val bytes = graft.functions.BloomExprs.serialize(bloom)
    val train = tagged.filter(col("__split") === trainLabel)
      .select(col(idCol).as("train_id"), col("shingle"))
      .filter(graft.functions.BloomExprs.bloom_might_contain(col("shingle"), bytes))
    test.join(train, "shingle")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .groupBy(col("train_id"))
      .agg(
        countDistinct(col("test_id")).as("n_test_docs"),
        max(col("n_shared")).as("worst_overlap"))
  }

  /** SKETCH-ROUTE DECONTAMINATION SCREEN (r17 — VERDICT r16 #6, the
    * third decontam route after the exact join (q86) and the bloom
    * prefilter (q89)): estimate how much of each BENCHMARK's vocabulary
    * the corpus has EVER seen, from kilobyte payloads — the corpus's
    * maintained theta set sketch (the
    * [[graft.streaming.EventStream.thetaSketchIncremental]] state, one
    * stored row that a stream keeps current forever) intersected with
    * each benchmark's own token sketch. Per benchmark: estimated
    * vocabulary size, estimated overlap with the corpus set, estimated
    * novel remainder — each a theta set operation over two payloads, so
    * the CORPUS side costs nothing at screen time regardless of corpus
    * size (it was paid once, incrementally, by the stream). The
    * benchmark side is one map-side-partial `theta_agg` pass over the
    * benchmark tokens — small by definition. No corpus-side join,
    * shuffle, or scan exists in this path; the trade against q86/q89 is
    * exactness (estimates within the theta RSE, ~1/√(2^lgK −1) per
    * set op) and granularity (set-level contamination, not per-doc drop
    * lists — the screen TRIAGES which benchmarks need the exact route).
    *
    * `benchmarks` carries one row per (benchmark, token); empty tokens
    * are dropped on both sides of every gate (theta rejects '' — the
    * q212 rule). Each measure comes with the LIBRARY's own confidence
    * interval at `numStd` standard deviations (adaptive to the operands'
    * actual thetas — an a-priori RSE band misstates intersection error,
    * which scales with the sampling rate, not the result's size):
    * (bench, est_vocab, vocab_lb, vocab_ub, est_overlap, overlap_lb,
    * overlap_ub, est_novel, novel_lb, novel_ub).
    */
  def decontamSketchScreen(
      spark: org.apache.spark.sql.SparkSession, sketchTable: String,
      benchmarks: DataFrame, benchCol: String, tokenCol: String,
      lgK: Int = 12, numStd: Int = 3): DataFrame = {
    import graft.functions.SketchAggs
    import spark.implicits._
    val corpusSk = graft.sources.Store.read(spark, sketchTable)
      .select(col("sketch")).head().getAs[Array[Byte]](0)
    // one row (a few KB of sketch) per benchmark reaches the driver
    val perBench = benchmarks
      .filter(col(tokenCol).isNotNull && col(tokenCol) =!= "")
      .select(col(benchCol).cast("string").as("bench"), col(tokenCol).as("tok"))
      .groupBy(col("bench"))
      .agg(call_function("theta_agg", col("tok"), lit(lgK)).as("sk"))
      .collect()
    perBench.toSeq.map { r =>
      val sk = r.getAs[Array[Byte]]("sk")
      val (v, vlb, vub) = SketchAggs.thetaBounds(sk, numStd)
      val (o, olb, oub) = SketchAggs.thetaIntersectBounds(sk, corpusSk, numStd)
      val (n, nlb, nub) = SketchAggs.thetaAnotBBounds(sk, corpusSk, numStd)
      (r.getString(0), v, vlb, vub, o, olb, oub, n, nlb, nub)
    }.toDF("bench", "est_vocab", "vocab_lb", "vocab_ub",
      "est_overlap", "overlap_lb", "overlap_ub",
      "est_novel", "novel_lb", "novel_ub")
  }
}
