package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Dedup, TextStats, Training}

/** Training-data curation battery over `documents` — the steps between a
  * deduped corpus and a trainer: deterministic splits, stratified sampling,
  * sequence packing, context-window chunking, and train/test
  * decontamination ([[graft.ops.Training]]).
  *
  * Every "random" decision is an md5-hex-prefix pure function of `doc_id`,
  * so each query has a full-hash DuckDB oracle replaying the exact same
  * bits — and the oracle CASE/threshold SQL is GENERATED from the same
  * Scala fractions/rates (the q27 pattern), so the twins cannot drift.
  */
object TrainingOps {

  /** The battery's split spec: last entry is the catch-all. */
  private val Splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Per-language sampling rates for the stratified-sample gate; languages
    * absent here (de, es) fall to the default rate below.
    */
  private val Rates = Map("en" -> 0.5, "zh" -> 0.3, "fr" -> 0.25)
  private val DefaultRate = 0.1

  private val PackBudget = 512L

  /** Per-language exact quotas for the q84 gate (labels absent fall to the
    * default) — 'en' clips, small strata pass through whole.
    */
  private val ExactCounts = Map("en" -> 60L, "zh" -> 25L, "de" -> 120L)
  private val ExactDefault = 10L

  /** Surrogate chunk key shared by q80/q87: unique, order-preserving, same
    * arithmetic as the oracle. Uniqueness requires chunk_start < 1e6 (docs
    * under ~64M tokens at chunk size 64); the bound is ENFORCED — an
    * over-limit doc raises instead of silently colliding into the next
    * doc_id's key space (ADVICE r6).
    */
  private def cidCol: org.apache.spark.sql.Column =
    col("doc_id") * lit(1000000L) +
      when(col("chunk_start") < lit(1000000), col("chunk_start"))
        .otherwise(raise_error(concat(
          lit("cid overflow: chunk_start "), col("chunk_start").cast("string"),
          lit(" >= 1e6 for doc_id "), col("doc_id").cast("string"))))

  /** q110's seeded two-vocabulary fixture: even ids draw 30 tokens from
    * {alpha0..19}, odd ids from {beta0..19} — deterministic driver RNG,
    * fixed generation order (the clustered-ANN-fixture convention).
    * Declared BEFORE [[defs]]: the oracle strings read these eagerly at
    * object init, and a forward val reference is silently null.
    */
  private val ClfDocs = 400
  private val ClfSplits = Seq("train" -> 0.8, "test" -> 0.2)
  private val ClfSeed = "graft-clf"

  private lazy val ClassifierFixture: Seq[(Long, String, Int)] = {
    val rnd = new scala.util.Random(0xC1A551F1L)
    (0 until ClfDocs).map { i =>
      val label = i % 2
      val prefix = if (label == 0) "alpha" else "beta"
      val toks = Seq.fill(30)(s"$prefix${rnd.nextInt(20)}")
      (i.toLong, toks.mkString(" "), label)
    }
  }

  /** q119's planted BPE corpus — Sennrich's worked example: word counts
    * {low:5, lower:2, newest:6, widest:3} make the whole merge sequence
    * hand-computable (with the `</w>` end marker): es:9 → est:9 →
    * est</w>:9 → lo:7 → low:7, ties broken lexicographically. Under the
    * batched trainer (stop-at-first-conflict rounds) the same five merges
    * land in rounds 1,2,3,3,4 — est</w> and lo are symbol-disjoint and
    * batch; every chain step serializes.
    */
  private lazy val BpeFixture: Seq[(Long, String)] = Seq(
    (0L, Seq.fill(5)("low").mkString(" ")),
    (1L, Seq.fill(2)("lower").mkString(" ")),
    (2L, Seq.fill(6)("newest").mkString(" ")),
    (3L, Seq.fill(3)("widest").mkString(" ")))

  /** q198's packing corpus: words with CLOSED-FORM segmentation sizes
    * under the q119-trained merges (the q190 table), repeated 1–4 times —
    * every doc's whitespace and BPE counts are literal arithmetic, so the
    * oracle replays both packing routes from a VALUES table.
    */
  private val PackBpeWords: Seq[(String, Long)] =
    Seq(("low", 2L), ("zz", 3L), ("newest", 4L), ("slower", 5L), ("wider", 6L))
  private val PackBpeBudget = 40L
  // the floor-rule ceiling: budget + max single-doc BPE size (4 × wider)
  private val PackBpeBound = PackBpeBudget + 24L
  private lazy val PackBpeFixture: Seq[(Long, String)] =
    (0L until 400L).map { i =>
      val w = PackBpeWords((i % 5).toInt)._1
      val m = (i % 4 + 1).toInt
      (i, Seq.fill(m)(w).mkString(" "))
    }

  val defs: Seq[QueryDef] = Seq(

    // Deterministic train/val/test split: label is a pure function of
    // doc_id (map-only, reshuffle/rerun/engine stable); gate checks the
    // three strata's exact membership via counts + char totals.
    QueryDef(
      "q73_train_split",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            Training.splitColumn(col("doc_id"), Splits).as("split"),
            col("n_chars"), col("lang"))
          .groupBy(col("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("split")),
      Some(s"""
        SELECT ${Training.splitSql("doc_id", Splits)} AS split,
          count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          count(DISTINCT lang) AS n_langs
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // Shard-local greedy sequence packing: 16 hash shards, per-shard
    // running token count, bin = floor(start_offset / budget). The window
    // is PARTITIONED (PlanSpec pins no global window) — the shape that
    // scales by raising the shard count, not by a single global sort.
    QueryDef(
      "q74_sequence_packing",
      (s, dir) =>
        Training.packBins(
            Tables.documents(s, dir)
              .select(col("doc_id"), TextStats.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "n_tokens", budget = PackBudget)
          .groupBy(col("shard"), col("bin"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("bin_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("shard"), col("bin")),
      Some(s"""
        WITH t AS (
          SELECT doc_id,
            len(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens,
            ${Training.hashHexSql("doc_id", "graft-pack", hexChars = 1)} AS shard
          FROM documents),
        c AS (
          SELECT shard, doc_id, n_tokens,
            sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
          FROM t)
        SELECT shard, CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS bin,
          count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
          min(doc_id) AS first_doc
        FROM c GROUP BY shard, bin ORDER BY shard, bin""")),

    // Packing-efficiency datasheet over q74's bins: per shard, bin/item
    // counts, token mass, worst bin, over-budget bins (live both ways:
    // packBins lets a large doc overshoot its bin — this is the report
    // that catches an under-sized chunk step), fill rate. Oracle extends
    // q74's CTE with the same two-level aggregate.
    QueryDef(
      "q129_packing_stats",
      (s, dir) =>
        Training.packingStats(
            Training.packBins(
              Tables.documents(s, dir)
                .select(col("doc_id"), TextStats.tokenCount(col("text")).as("n_tokens")),
              "doc_id", "n_tokens", budget = PackBudget),
            "n_tokens", budget = PackBudget)
          .orderBy(col("shard")),
      Some(s"""
        WITH t AS (
          SELECT doc_id,
            len(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens,
            ${Training.hashHexSql("doc_id", "graft-pack", hexChars = 1)} AS shard
          FROM documents),
        c AS (
          SELECT shard, doc_id, n_tokens,
            sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
          FROM t),
        bins AS (
          SELECT shard, CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS bin,
            count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok
          FROM c GROUP BY shard, bin)
        SELECT shard,
          CAST(count(*) AS BIGINT) AS n_bins,
          CAST(sum(n) AS BIGINT) AS n_items,
          CAST(sum(tok) AS BIGINT) AS total_tokens,
          max(tok) AS max_bin_tokens,
          CAST(sum(CASE WHEN tok > $PackBudget THEN 1 ELSE 0 END) AS BIGINT)
            AS n_over_budget,
          round(CAST(sum(tok) AS DOUBLE) / CAST(count(*) * $PackBudget AS DOUBLE), 4)
            AS fill_rate
        FROM bins GROUP BY shard ORDER BY shard""")),

    // Stratified sampling: per-language keep rates as hash thresholds — a
    // map-only FILTER (no shuffle, no stratum-size pre-pass, reproducible
    // exact membership). Gate returns the sampled rows themselves.
    QueryDef(
      "q75_stratified_sample",
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(Training.stratifiedKeep(col("doc_id"), col("lang"), Rates, DefaultRate))
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id, lang, source FROM documents
        WHERE ${Training.stratifiedKeepSql("doc_id", "lang", Rates, DefaultRate)}
        ORDER BY doc_id""")),

    // Train/test decontamination: (test, train) doc pairs sharing ≥2
    // distinct word-3-shingles, via the SAME shingle inverted-index join
    // shape as q24 (cost bounded by shingle DF, never all-pairs) — split
    // routing is a per-row function of doc_id, adding no join. The
    // hot-shingle DF cap is on (derived in-job at the observed max, the
    // q24 pattern), so the gate practices the guard its own docstring
    // prescribes while the uncapped SQL twin stays exact.
    QueryDef(
      "q76_decontamination",
      (s, dir) =>
        Training.contaminationPairs(
            Dedup.wordShingles(Tables.documents(s, dir), "doc_id", "text", w = 3),
            "doc_id",
            Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L,
            capAtObservedMax = true)
          .orderBy(col("n_shared").desc, col("test_id"), col("train_id"))
          .limit(20),
      Some(s"""
        WITH ${OracleFrags.contamPairsCtes("documents", "cp", Splits, minShared = 2L)}
        SELECT test_id, train_id, n_shared FROM cp
        ORDER BY n_shared DESC, test_id, train_id LIMIT 20""")),

    // The decontamination DROP LIST — the frame a pipeline left-anti-joins
    // against its train split: contaminated train docs with blast-radius
    // stats (distinct test docs leaked into, worst overlap). Same capped
    // inverted-index join as q76 plus one train_id-keyed aggregate.
    QueryDef(
      "q86_decontam_droplist",
      (s, dir) =>
        Training.contaminatedTrainDocs(
            Dedup.wordShingles(Tables.documents(s, dir), "doc_id", "text", w = 3),
            "doc_id",
            Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L,
            capAtObservedMax = true)
          .orderBy(col("train_id")),
      Some(s"""
        WITH ${OracleFrags.contamPairsCtes("documents", "cp", Splits, minShared = 2L)}
        SELECT train_id, count(DISTINCT test_id) AS n_test_docs,
          CAST(max(n_shared) AS BIGINT) AS worst_overlap
        FROM cp GROUP BY train_id ORDER BY train_id""")),

    // The decontamination drop list again, through the BLOOM-prefilter
    // fast path: a Bloom filter built over the test split's shingles is
    // broadcast into the train-side scan and drops non-colliding train
    // shingles BEFORE the exchange — the 100 TB shape (train shuffle
    // shrinks to ~|test shingles|). Exactness is structural (no false
    // negatives; false positives die in the exact join), so the oracle is
    // the very same uncapped SQL twin as q86 — one fragment, two
    // physical routes, both hash-gated.
    QueryDef(
      "q89_decontam_bloom",
      (s, dir) =>
        Training.bloomContaminatedTrainDocs(
            Dedup.wordShingles(Tables.documents(s, dir), "doc_id", "text", w = 3),
            "doc_id",
            Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L)
          .orderBy(col("train_id")),
      Some(s"""
        WITH ${OracleFrags.contamPairsCtes("documents", "cp", Splits, minShared = 2L)}
        SELECT train_id, count(DISTINCT test_id) AS n_test_docs,
          CAST(max(n_shared) AS BIGINT) AS worst_overlap
        FROM cp GROUP BY train_id ORDER BY train_id""")),

    // SKETCH-ROUTE DECONTAMINATION SCREEN (r17 —
    // [[graft.ops.Training.decontamSketchScreen]], the third decontam
    // route after q86's exact join and q89's bloom prefilter): the
    // corpus's maintained theta set sketch (the q217 streaming state —
    // built here through the same [[graft.streaming.EventStream
    // .applyThetaBatch]] kernel the sink runs) is intersected per
    // BENCHMARK with that benchmark's own token sketch, so "how
    // contaminated is benchmark X" costs two kilobyte payloads at screen
    // time — no corpus-side join, shuffle, or scan, at any corpus size.
    // Three benchmark slices of the held-out source screen against the
    // rest-of-corpus vocabulary. Hash-compared: exact per-benchmark
    // vocab and overlap counts (DuckDB); certificates: each exact count
    // inside the LIBRARY's own 3σ interval for its set operation
    // (adaptive bounds — a fixed RSE band misstates intersection error),
    // never hashing an estimate. Empty tokens filtered both sides (the
    // q212 rule).
    QueryDef(
      "q222_decontam_sketch",
      (s, dir) => {
        import s.implicits._
        val table = "q222_sketch"
        s.sql(s"DROP TABLE IF EXISTS $table")
        val toks = Tables.documents(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            explode(TextStats.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        graft.streaming.EventStream.applyThetaBatch(
          toks.filter(col("source") =!= "src0"),
          b => b.select(col("tok").as("value")), table, lgK = 12)
        val bm = toks.filter(col("source") === "src0")
          .select((col("doc_id") % 3).cast("string").as("bench"), col("tok"))
        val screen = Training.decontamSketchScreen(
          s, table, bm, "bench", "tok", lgK = 12, numStd = 3)
        // exact counts: distinct bench vocab + membership in the distinct
        // corpus token set (the oracle's closed form)
        val corpusToks = toks.filter(col("source") =!= "src0")
          .select(col("tok")).distinct()
        val exact = bm.distinct()
          .join(corpusToks.withColumn("__in", lit(1)), Seq("tok"), "left")
          .groupBy(col("bench"))
          .agg(count(lit(1)).as("n_vocab"),
            sum(coalesce(col("__in"), lit(0))).cast("long").as("n_overlap"))
        val result = exact.join(screen, Seq("bench"))
          .select(col("bench"), col("n_vocab"), col("n_overlap"),
            (col("vocab_lb") <= col("n_vocab") &&
              col("n_vocab") <= col("vocab_ub")).as("vocab_ok"),
            (col("overlap_lb") <= col("n_overlap") &&
              col("n_overlap") <= col("overlap_ub")).as("overlap_ok"),
            (col("novel_lb") <= col("n_vocab") - col("n_overlap") &&
              col("n_vocab") - col("n_overlap") <= col("novel_ub")).as("novel_ok"))
          .orderBy(col("bench"))
          .localCheckpoint()
        s.sql(s"DROP TABLE IF EXISTS $table")
        result
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
            unnest(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS tok
          FROM documents WHERE text IS NOT NULL),
        corpus AS (
          SELECT DISTINCT tok FROM toks WHERE source <> 'src0' AND tok <> ''),
        bm AS (
          SELECT DISTINCT CAST(doc_id % 3 AS VARCHAR) AS bench, tok
          FROM toks WHERE source = 'src0' AND tok <> '')
        SELECT bm.bench, CAST(count(*) AS BIGINT) AS n_vocab,
          CAST(sum(CASE WHEN c.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
          true AS vocab_ok, true AS overlap_ok, true AS novel_ok
        FROM bm LEFT JOIN corpus c ON bm.tok = c.tok
        GROUP BY bm.bench ORDER BY bm.bench""")),

    // The composed curation pipeline — the operators above chained into
    // the corpus → training-shards job a real pretraining pipeline runs:
    // exact-dedup keepers → quality filter → deterministic split →
    // 64-token chunking → per-(split, shard) sequence packing → bin
    // manifest. ONE query, one composed SQL twin built from the same
    // stage CTEs that gate individually (q21/q28/q73/q77/q74), so a
    // semantic drift in any stage breaks this gate too.
    QueryDef(
      "q80_curation_pipeline",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val keepers = Dedup.exactGroups(docs, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val kept = docs.join(keepers, Seq("doc_id"), "left_semi")
        val quality = kept.filter(TextStats.qualityScore(col("text")) >= 0.99)
        val chunks = Training.chunkTokens(quality, "doc_id", "text",
            chunkSize = 64, stride = 64)
          .withColumn("cid", cidCol)
          // split is a pure function of the PARENT doc id: every chunk of
          // a document lands in the same split — no join to route it
          .withColumn("split", Training.splitColumn(col("doc_id"), Splits))
        Training.packBins(
            chunks.select(col("cid"), col("split"), col("chunk_tokens")),
            "cid", "chunk_tokens", budget = PackBudget,
            partitionCols = Seq("split"))
          .groupBy(col("split"), col("shard"), col("bin"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_tokens")).cast("long").as("bin_tokens"))
          .orderBy(col("split"), col("shard"), col("bin"))
      },
      Some(s"""
        WITH ${OracleFrags.exactKeepCtes("documents", "kept")},
        ${OracleFrags.qualityCtes("kept", "q", minScore = 0.99)},
        ${OracleFrags.chunkPackSelect("q", chunkSize = 64, budget = PackBudget, Splits)}""")),

    // The FULL curation pipeline — every curation operator in the library
    // composed into the one job a pretraining pipeline actually runs:
    // exact-dedup keepers → NEAR-dup keepers (LSH clusters, q83's
    // operator) → quality filter → deterministic split → decontamination
    // drop (q86's operator) → 64-token chunking → per-(split, shard)
    // packing → bin manifest. The oracle is COMPOSED from the same CTE
    // fragments that gate each stage alone (q21/q78/q28/q73/q76/q77/q74),
    // so a semantic drift in any stage breaks this gate too.
    QueryDef(
      "q87_curation_pipeline_full",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // 1. exact dedup
        val kept1 = docs.join(
          Dedup.exactGroups(docs, "doc_id", "text").select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        // 2. near-dup keepers over the exact-kept corpus (same LSH pair
        // pipeline q78/q85 gate)
        val sig = Dedup.minhashSignaturesScanLocal(kept1, "doc_id", "text", k = 4, w = 3)
        val nearPairs = Dedup.minhashCandidates(
          Dedup.minhashBands(sig, "doc_id", k = 4, r = 2), "doc_id")
        val kept2 = kept1.join(
          Dedup.keepers(kept1, "doc_id", nearPairs)
            .filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        // 3. quality filter
        val quality = kept2.filter(TextStats.qualityScore(col("text")) >= 0.99)
        // 4 + 5. split + decontamination drop (train docs leaking ≥2
        // shingles into test; capped in-job like q76/q86)
        val drop = Training.contaminatedTrainDocs(
            Dedup.wordShingles(quality, "doc_id", "text", w = 3),
            "doc_id", Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L, capAtObservedMax = true)
          .select(col("train_id").as("doc_id"))
        val clean = quality.join(drop, Seq("doc_id"), "left_anti")
        // 6 + 7. chunk → surrogate key → pack per (split, shard)
        val chunks = Training.chunkTokens(clean, "doc_id", "text",
            chunkSize = 64, stride = 64)
          .withColumn("cid", cidCol)
          .withColumn("split", Training.splitColumn(col("doc_id"), Splits))
        Training.packBins(
            chunks.select(col("cid"), col("split"), col("chunk_tokens")),
            "cid", "chunk_tokens", budget = PackBudget,
            partitionCols = Seq("split"))
          .groupBy(col("split"), col("shard"), col("bin"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_tokens")).cast("long").as("bin_tokens"))
          .orderBy(col("split"), col("shard"), col("bin"))
      },
      Some(s"""
        WITH RECURSIVE ${OracleFrags.exactKeepCtes("documents", "kept1")},
        ${OracleFrags.dedupWalkCtes("kept1")},
        cc AS (
          SELECT id AS doc_id, min(component) AS component
          FROM walk GROUP BY id),
        kept2 AS (
          SELECT k.doc_id, k.text FROM kept1 k LEFT JOIN cc USING (doc_id)
          WHERE coalesce(cc.component, k.doc_id) = k.doc_id),
        ${OracleFrags.qualityCtes("kept2", "q", minScore = 0.99)},
        ${OracleFrags.contamPairsCtes("q", "cp", Splits, minShared = 2L)},
        clean AS (
          SELECT doc_id, text FROM q
          WHERE doc_id NOT IN (SELECT train_id FROM cp)),
        ${OracleFrags.chunkPackSelect("clean", chunkSize = 64, budget = PackBudget, Splits)}""")),

    // The r7 operator battery composed into one gated pipeline: PII
    // redaction → exact dedup (on the REDACTED text) → quality filter →
    // temperature mixture sampling by lang (α = 0.5, rates derived from
    // the post-quality distribution in-job) → split + decontamination
    // drop → 64-token chunking → per-(split, shard) packing. Every stage
    // twin is the same fragment/generated SQL that gates the stage alone
    // (q90/q21/q28/q91/q86/q77/q74), so drift in any one breaks both its
    // own gate and this composition.
    QueryDef(
      "q96_curation_pipeline_r7",
      (s, dir) => {
        val red = Tables.documents(s, dir)
          .select(col("doc_id"), TextStats.redactPii(col("text")).as("text"),
            col("lang"))
        val kept = red.join(
          Dedup.exactGroups(red, "doc_id", "text").select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        val quality = kept.filter(TextStats.qualityScore(col("text")) >= 0.99)
        val rates = Training.temperatureRates(quality, "lang", alpha = 0.5)
        val sampled = Training.temperatureKeep(quality, "doc_id", "lang", rates)
          .select(col("doc_id"), col("text"))
        val drop = Training.contaminatedTrainDocs(
            Dedup.wordShingles(sampled, "doc_id", "text", w = 3),
            "doc_id", Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L, capAtObservedMax = true)
          .select(col("train_id").as("doc_id"))
        val clean = sampled.join(drop, Seq("doc_id"), "left_anti")
        val chunks = Training.chunkTokens(clean, "doc_id", "text",
            chunkSize = 64, stride = 64)
          .withColumn("cid", cidCol)
          .withColumn("split", Training.splitColumn(col("doc_id"), Splits))
        Training.packBins(
            chunks.select(col("cid"), col("split"), col("chunk_tokens")),
            "cid", "chunk_tokens", budget = PackBudget,
            partitionCols = Seq("split"))
          .groupBy(col("split"), col("shard"), col("bin"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_tokens")).cast("long").as("bin_tokens"))
          .orderBy(col("split"), col("shard"), col("bin"))
      },
      Some(s"""
        WITH red AS (
          SELECT doc_id, ${TextStats.redactPiiSql("text")} AS text, lang
          FROM documents),
        ${OracleFrags.exactKeepCtes("red", "kept")},
        ${OracleFrags.qualityCtes("kept", "q", minScore = 0.99)},
        ql AS (
          SELECT q.doc_id, q.text, d.lang FROM q JOIN documents d USING (doc_id)),
        c AS (SELECT lang, count(*) AS n_docs FROM ql GROUP BY lang),
        m AS (SELECT min(n_docs) AS n_min FROM c),
        r AS (
          SELECT lang, CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE))
                       * 4294967296.0) AS BIGINT) AS thr
          FROM c, m),
        samp AS (
          SELECT ql.doc_id, ql.text FROM ql JOIN r USING (lang)
          WHERE ('0x' || substr(md5('graft-mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr),
        ${OracleFrags.contamPairsCtes("samp", "cp", Splits, minShared = 2L)},
        clean AS (
          SELECT doc_id, text FROM samp
          WHERE doc_id NOT IN (SELECT train_id FROM cp)),
        ${OracleFrags.chunkPackSelect("clean", chunkSize = 64, budget = PackBudget, Splits)}""")),

    // EXACT-count stratified sample: per-language quotas via a per-stratum
    // window top-k by hash (one shuffle keyed on the label; the rank
    // filter's constant conjunct plans a WindowGroupLimit so the shuffle
    // carries at most max-quota rows per stratum per task — PlanSpec).
    // Quotas straddle the sf0.01 stratum sizes: 'en' is clipped by its
    // quota, 'de' is smaller than 120 so the whole stratum survives —
    // both branches gated. Oracle replays the identical hash ordering.
    QueryDef(
      "q84_stratified_exact",
      (s, dir) =>
        Training.stratifiedExact(
            Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")),
            "doc_id", "lang", ExactCounts, ExactDefault)
          .orderBy(col("doc_id")),
      Some(s"""
        WITH r AS (
          SELECT doc_id, lang, source,
            row_number() OVER (PARTITION BY lang
              ORDER BY ${Training.hashHexSql("doc_id", "graft-strat-exact")}, doc_id) AS rn
          FROM documents)
        SELECT doc_id, lang, source FROM r
        WHERE ${Training.stratifiedExactSql("lang", ExactCounts, ExactDefault)}
        ORDER BY doc_id""")),

    // Temperature-based mixture rebalancing (α = 0.5): per-language
    // sampling rates rate = sqrt(n_min/n_lang) — downsample-only, the
    // smallest stratum keeps everything, post-sample shares follow
    // p^0.5 — then the map-only hash-threshold sampling pass and the
    // achieved per-stratum counts. sqrt and the hash threshold replay
    // bit-for-bit in the oracle (IEEE-correctly-rounded on both engines);
    // the 1-row n_min frame is a broadcast scalar subquery (q24 pattern).
    QueryDef(
      "q91_temperature_mixture",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val rates = Training.temperatureRates(docs, "lang", alpha = 0.5)
        val sampled = Training.temperatureKeep(docs, "doc_id", "lang", rates)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        rates.join(sampled, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("rate"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        m AS (SELECT min(n_docs) AS n_min FROM c),
        r AS (
          SELECT lang, n_docs,
            sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate,
            CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE))
                       * 4294967296.0) AS BIGINT) AS thr
          FROM c, m),
        s AS (
          SELECT d.lang, count(*) AS n_sampled
          FROM documents d JOIN r USING (lang)
          WHERE ('0x' || substr(md5('graft-mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
          GROUP BY d.lang)
        SELECT r.lang, r.n_docs, r.rate, coalesce(s.n_sampled, 0) AS n_sampled
        FROM r LEFT JOIN s USING (lang) ORDER BY lang""")),

    // Cross-document repeated spans: 24-token windows at EVERY position
    // (native word_shingles pass), thinned by a content-defined anchor
    // (fp-prefix ≡ 0 mod 8 — alignment-free, unlike a stride grid), then
    // one fp-keyed aggregate; windows shared by >1 doc are verbatim
    // repeated passages (Lee et al. 2021's passage dedup, window-granular).
    // The oracle replays windows, fingerprints, and the anchor rule
    // exactly.
    QueryDef(
      "q93_repeated_spans",
      (s, dir) =>
        Training.repeatedSpans(Tables.documents(s, dir), "doc_id", "text",
            spanTokens = 24, anchorMod = 8)
          .orderBy(col("span_fp")),
      Some(s"""
        WITH ${OracleFrags.anchoredWindowsCtes("documents", spanTokens = 24, anchorMod = 8)}
        SELECT span_fp, count(DISTINCT doc_id) AS n_docs,
          count(*) AS n_occurrences, min(doc_id) AS first_doc
        FROM a GROUP BY span_fp HAVING count(DISTINCT doc_id) > 1
        ORDER BY span_fp""")),

    // The q93 CONSUMER: per-document cross-corpus repetition blast radius
    // — the fraction of a doc's anchored windows that are passages shared
    // with other documents; the frame a pipeline thresholds to drop
    // boilerplate-heavy docs (within-doc loops are q79's job; this is
    // ACROSS-doc boilerplate). Same shared window fragment as q93, so
    // the producer and its consumer cannot drift.
    QueryDef(
      "q95_repeated_span_stats",
      (s, dir) =>
        Training.repeatedSpanStats(Tables.documents(s, dir), "doc_id", "text",
            spanTokens = 24, anchorMod = 8)
          .orderBy(col("doc_id")),
      Some(s"""
        WITH ${OracleFrags.anchoredWindowsCtes("documents", spanTokens = 24, anchorMod = 8)},
        rep AS (
          SELECT span_fp FROM a GROUP BY span_fp HAVING count(DISTINCT doc_id) > 1)
        SELECT a.doc_id, count(*) AS n_windows,
          CAST(sum(CASE WHEN r.span_fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
          CAST(sum(CASE WHEN r.span_fp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
            AS repeated_frac
        FROM a LEFT JOIN rep r USING (span_fp)
        GROUP BY a.doc_id ORDER BY doc_id""")),

    // Context-window chunking: disjoint 32-token windows per document —
    // the map-side explode that precedes packing when bins must be ≤
    // budget exactly. Gate hashes every chunk's text fingerprint.
    QueryDef(
      "q77_context_chunks",
      (s, dir) =>
        Training.chunkTokens(Tables.documents(s, dir), "doc_id", "text",
            chunkSize = 32, stride = 32)
          .select(
            col("doc_id"), col("chunk_start"), col("chunk_tokens"),
            substring(md5(col("chunk_text")), 1, 16).as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_start")),
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT doc_id, CAST(i AS INTEGER) AS chunk_start, t[i:i+31] AS chunk
          FROM toks, unnest(generate_series(1, greatest(len(t), 1), 32)) AS g(i))
        SELECT doc_id, chunk_start, CAST(len(chunk) AS INTEGER) AS chunk_tokens,
          substr(md5(array_to_string(chunk, ' ')), 1, 16) AS chunk_fp
        FROM c ORDER BY doc_id, chunk_start""")),

    // DSIR-style target-affinity scoring (Xie et al. 2023), exact-
    // arithmetic form: target = the English slice; each doc scores the
    // target's share of the corpus-wide mass of its tokens — a ratio of
    // two exact integer sums (one correctly-rounded division, the q79
    // rule), so every row carries a full hash oracle. The data-selection
    // signal a pipeline thresholds/resamples on to tilt a corpus toward
    // an in-domain slice.
    QueryDef(
      "q102_target_affinity",
      (s, dir) =>
        Training.targetAffinity(Tables.documents(s, dir), "doc_id", "text",
            col("lang") === "en")
          .orderBy(col("doc_id")),
      Some(s"""
        WITH ${OracleFrags.affinityCtes("documents", "aff", "lang = 'en'")}
        SELECT doc_id, n_tokens, tgt_mass, all_mass, affinity
        FROM aff ORDER BY doc_id""")),

    // Per-source quota (C4/RefinedWeb domain caps): keep at most 15 docs
    // per source — the smallest hash handles, so membership is a pure
    // function of the id set. Every source holds 25 docs at any sf, so
    // the cap bites everywhere; same windowed shape (and
    // WindowGroupLimit pruning) as q84.
    QueryDef(
      "q103_source_quota",
      (s, dir) =>
        Training.sourceQuota(
            Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang")),
            "doc_id", "source", cap = 15)
          .orderBy(col("doc_id")),
      Some(s"""
        WITH base AS (SELECT doc_id, source, lang FROM documents),
        ${OracleFrags.sourceQuotaCtes("base", "quota", cap = 15)}
        SELECT doc_id, source, lang FROM quota ORDER BY doc_id""")),

    // Deterministic shard routing + per-shard manifests: the global
    // shuffle a trainer wants, as a pure hash function of doc_id (no RNG
    // state — rerun/retry/engine stable), reduced to the nShards-row
    // manifest frame a shard writer emits (count, payload bytes, order-key
    // range). The oracle replays shard AND order hashes bit-for-bit.
    QueryDef(
      "q104_shard_manifest",
      (s, dir) =>
        Training.shardManifest(Tables.documents(s, dir), "doc_id", "n_chars",
            nShards = 16)
          .orderBy(col("shard")),
      Some(s"""
        WITH s AS (
          SELECT doc_id, n_chars,
            ${Training.shardSql("doc_id", 16)} AS shard,
            ${Training.shardOrderKeySql("doc_id")} AS ok
          FROM documents)
        SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_size,
          min(ok) AS first_key, max(ok) AS last_key
        FROM s GROUP BY shard ORDER BY shard""")),

    // Deterministic EXACT-size global sample: the 100 smallest hash
    // handles corpus-wide — TakeOrderedAndProject (bounded per-task
    // heaps, no global sort; PlanSpec pins it), membership a pure
    // function of the id set, samples nested across sizes.
    QueryDef(
      "q105_global_sample",
      (s, dir) =>
        Training.globalSample(
            Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang")),
            "doc_id", n = 100)
          .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id, source, lang FROM (
          SELECT doc_id, source, lang FROM documents
          ORDER BY ${Training.hashHexSql("doc_id", "graft-gsample")}, doc_id
          LIMIT 100)
        ORDER BY doc_id""")),

    // TOP-FRACTION quality cut per source ([[Training.topFractionPerGroup]])
    // — the FineWeb/C4-style "keep each source's best 30%" gate with
    // EXACT per-group counts (ceil(frac·n), non-empty groups keep ≥ 1)
    // instead of a global threshold that over-prunes weak sources.
    // Deterministic (score desc, id tie-break); the oracle replays the
    // same windowed rank + ceil arithmetic.
    QueryDef(
      "q183_top_fraction_per_source",
      (s, dir) =>
        Training.topFractionPerGroup(
            Tables.documents(s, dir).filter(col("text").isNotNull)
              .select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id", "source", "n_chars", frac = 0.3)
          .orderBy(col("doc_id")),
      Some("""
        WITH d AS (
          SELECT doc_id, source, n_chars FROM documents WHERE text IS NOT NULL),
        r AS (
          SELECT doc_id, source, n_chars,
            row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn,
            count(*) OVER (PARTITION BY source) AS n
          FROM d)
        SELECT doc_id, source, n_chars FROM r
        WHERE rn <= ceil(0.3 * n) ORDER BY doc_id""")),

    // TOKEN-BUDGET TRUNCATION ([[Training.truncateTokens]]): clip every
    // document to its first 40 canonical tokens — the context-length
    // guard before packing (one 2M-token outlier otherwise owns a whole
    // bin). Map-side slice+rejoin of the scan-local token array; emits
    // the original count and a truncated flag so accounting stays
    // honest. The oracle replays the slice on the same canonical split.
    QueryDef(
      "q184_token_truncation",
      (s, dir) =>
        Training.truncateTokens(
            Tables.documents(s, dir).filter(col("text").isNotNull)
              .select(col("doc_id"), col("text")),
            "text", maxTokens = 40)
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          array_to_string(t[1:40], ' ') AS text,
          CAST(len(t) AS BIGINT) AS n_tokens,
          len(t) > 40 AS truncated
        FROM (
          SELECT doc_id,
            string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
          FROM documents WHERE text IS NOT NULL)
        ORDER BY doc_id""")),

    // WEIGHTED sample without replacement ([[Training.weightedSample]],
    // Efraimidis–Spirakis 2006): inclusion ∝ n_chars (the byte-budget
    // draw a curation mixture makes), via the ln(u)/w key over the
    // portable-hash uniform — fully deterministic, so the oracle replays
    // the exact key arithmetic and must select the identical 100 docs.
    // TrainingSpec pins the proportionality (a dominant weight wins) and
    // the q09 TakeOrdered shape keeps the top-n off a global sort.
    QueryDef(
      "q177_weighted_sample",
      (s, dir) =>
        Training.weightedSample(
            Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id", "n_chars", n = 100)
          .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars FROM documents
          WHERE n_chars > 0
          ORDER BY ${Training.weightedSampleKeySql("doc_id", "n_chars")} DESC, doc_id
          LIMIT 100)
        ORDER BY doc_id""")),

    // Composed acquisition-side pipeline over the r7-continuation
    // operators: per-source quota → target-affinity scoring ON THE
    // RETAINED corpus → keep docs tilted ABOVE the corpus-average target
    // share (a 1-row scalar subquery, the q24 cap pattern — DSIR's
    // importance-ratio > 1, and scale-self-calibrating where a FIXED
    // threshold was vacuous: the affinity distribution concentrates
    // around the corpus share, which itself shifts with sf, so any
    // absolute cut either keeps everything or nothing) → split labeling
    // → per-(split, shard) manifests. Every stage twin is the fragment
    // gating that stage alone (q103 quota, q102 affinity, q73 split,
    // q104 shard hashes), so stage drift breaks both gates.
    QueryDef(
      "q106_curation_sharding",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("lang"), col("text"), col("n_chars"))
        val quota = Training.sourceQuota(base, "doc_id", "source", cap = 15)
        val aff = Training.targetAffinity(quota, "doc_id", "text", col("lang") === "en")
        val share = aff.agg(
          (sum(col("tgt_mass")).cast("double") / sum(col("all_mass"))).as("share"))
        val kept = quota
          .join(aff.select(col("doc_id"), col("affinity")), Seq("doc_id"))
          .crossJoin(broadcast(share))
          .filter(col("affinity") > col("share"))
        kept
          .select(col("doc_id"), col("n_chars"),
            Training.splitColumn(col("doc_id"), Splits).as("split"),
            Training.shardColumn(col("doc_id"), nShards = 8).as("shard"),
            Training.shardOrderKey(col("doc_id")).as("__ok"))
          .groupBy(col("split"), col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_size"),
            min(col("__ok")).as("first_key"),
            max(col("__ok")).as("last_key"))
          .orderBy(col("split"), col("shard"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id, source, lang, text, n_chars FROM documents),
        ${OracleFrags.sourceQuotaCtes("base", "quota", cap = 15)},
        ${OracleFrags.affinityCtes("quota", "aff", "lang = 'en'")},
        tot AS (
          SELECT CAST(sum(tgt_mass) AS DOUBLE) / sum(all_mass) AS share FROM aff),
        kept AS (
          SELECT q.doc_id, q.n_chars FROM quota q
          JOIN aff USING (doc_id), tot WHERE aff.affinity > tot.share),
        s AS (
          SELECT doc_id, n_chars,
            ${Training.splitSql("doc_id", Splits)} AS split,
            ${Training.shardSql("doc_id", 8)} AS shard,
            ${Training.shardOrderKeySql("doc_id")} AS ok
          FROM kept)
        SELECT split, shard, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_size,
          min(ok) AS first_key, max(ok) AS last_key
        FROM s GROUP BY split, shard ORDER BY split, shard""")),

    // Learned quality classifier (the CCNet/GPT-3 classifier stage):
    // logistic regression over scan-local hash-embedded token counts,
    // trained on a hash-split train slice of a seeded two-vocabulary
    // fixture (disjoint token sets → linearly separable in hashed space),
    // scored map-only on the held-out test slice. Gate: PER-DOCUMENT
    // predictions on the test slice — the fixture is separable, so every
    // predicted label is deterministic (vocabulary rule: label = id % 2)
    // even though coefficient BITS are ~ulp run-dependent. The oracle
    // replays the split hash to pick the test ids and the vocabulary rule
    // for the expected prediction, so flipping any single document's
    // score hash-fails the gate (r7's counts + literal-true accuracy
    // flag under-constrained scoring — VERDICT r7 wrong #3).
    QueryDef(
      "q110_learned_filter",
      (s, _) => {
        import s.implicits._
        val docs = ClassifierFixture.toDF("id", "text", "label")
        val withSplit = docs.withColumn("split",
          Training.splitColumn(col("id"), ClfSplits, seed = ClfSeed))
        val model = graft.ml.TextClassifier.train(
          withSplit.filter(col("split") === "train"), "text", "label", dim = 64)
        graft.ml.TextClassifier.score(
            model, withSplit.filter(col("split") === "test"), "text", dim = 64)
          .select(col("id"), col("label").cast("long").as("label"), col("prediction"))
          .orderBy(col("id"))
      },
      Some(s"""
        WITH ids AS (SELECT g AS id FROM generate_series(0, ${ClfDocs - 1}) t(g))
        SELECT id, CAST(id % 2 AS BIGINT) AS label,
               CAST(id % 2 AS DOUBLE) AS prediction
        FROM ids
        WHERE ${Training.splitSql("id", ClfSplits, ClfSeed)} = 'test'
        ORDER BY id""")),

    // BPE tokenizer TRAINING ([[graft.ops.Bpe]]): each batched round runs
    // 2 tiny jobs over the word-frequency dict (the Lloyd's shape), never
    // the corpus. Gate: on the planted Sennrich corpus the entire merge
    // sequence is closed-form (see BpeFixture), so the oracle replays it
    // as literal rows — any drift in pair counting, tie-breaking, greedy
    // merge application, or the batching rule (the `round` column pins
    // stop-at-first-conflict round assignment) changes some row and
    // hash-fails.
    QueryDef(
      "q119_bpe_train",
      (s, _) => {
        import s.implicits._
        val docs = BpeFixture.toDF("id", "text")
        val (merges, _) = graft.ops.Bpe.train(docs, "text", nMerges = 5)
        merges.toDF().orderBy(col("step"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS INTEGER), 'e', 's', 'es', CAST(9 AS BIGINT), CAST(1 AS INTEGER)),
          (2, 'es', 't', 'est', 9, 2),
          (3, 'est', '</w>', 'est</w>', 9, 3),
          (4, 'l', 'o', 'lo', 7, 3),
          (5, 'lo', 'w', 'low', 7, 4)) AS t(step, lhs, rhs, merged, freq, round)
        ORDER BY step""")),

    // q119's consumer — per-document token counts under the TRAINED
    // vocabulary (what the packing budget actually consumes), through the
    // EXACT path: in-dict words broadcast-join the (word → |syms|) dict,
    // OOV words are ENCODED (merge sequence replayed by rank — q135 gates
    // the encoder itself). Gate: every count is hand-computable; doc 4
    // plants two OOV words where exact and floor DIFFER ("lowest" encodes
    // to [low, est</w>] = 2 tokens vs a 7-token character floor), so the
    // floor path cannot pass this gate.
    QueryDef(
      "q121_bpe_token_counts",
      (s, _) => {
        import s.implicits._
        val train = BpeFixture.toDF("id", "text")
        val (merges, dict) = graft.ops.Bpe.train(train, "text", nMerges = 5)
        // doc 4: "low" in-dict (2) + OOV "zz" ([z,z,</w>] = 3) + OOV
        // "lowest" ([low, est</w>] = 2) = 7 (floor would say 2+3+7 = 12)
        val corpus = (BpeFixture :+ ((4L, "low zz lowest"))).toDF("id", "text")
        graft.ops.Bpe.tokenCountsExact(corpus, "id", "text", dict, merges)
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), CAST(10 AS BIGINT)),
          (1, 8), (2, 24), (3, 12), (4, 7)) AS t(id, n_tokens)
        ORDER BY id""")),

    // BPE ENCODING — the tokenizer's second half ([[graft.ops.Bpe
    // .encodeWords]]): replay the trained merge sequence by rank over
    // arbitrary words, so OOV text gets its true learned segmentation.
    // Gate: corpus words must reproduce the trained dict's segmentation
    // exactly, and planted UNSEEN compounds ("lowest", "slower", "wider",
    // "zz") have closed-form segmentations under the q119 merge sequence
    // — the oracle replays all of them as literal rows.
    QueryDef(
      "q135_bpe_encode",
      (s, _) => {
        import s.implicits._
        val train = BpeFixture.toDF("id", "text")
        val (merges, _) = graft.ops.Bpe.train(train, "text", nMerges = 5)
        val words = Seq("low", "lower", "lowest", "newest", "slower",
          "wider", "widest", "zz").toDF("word")
        graft.ops.Bpe.encodeWords(words, "word", merges)
          .select(col("word"),
            concat_ws(" ", col("syms")).as("tokens"),
            size(col("syms")).cast("long").as("n_tokens"))
          .orderBy(col("word"))
      },
      Some("""
        SELECT * FROM (VALUES
          ('low', 'low </w>', CAST(2 AS BIGINT)),
          ('lower', 'low e r </w>', 4),
          ('lowest', 'low est</w>', 2),
          ('newest', 'n e w est</w>', 4),
          ('slower', 's low e r </w>', 5),
          ('wider', 'w i d e r </w>', 6),
          ('widest', 'w i d est</w>', 4),
          ('zz', 'z z </w>', 3)) AS t(word, tokens, n_tokens)
        ORDER BY word""")),

    // TOKENIZER-ACCURATE BUDGET TRUNCATION (r12 verdict #5 —
    // [[graft.ops.Bpe.truncateTokensBpe]]): clip each doc to the longest
    // word prefix whose TRUE BPE token total fits the budget, under the
    // q119-trained merges. The gate carries both claims: the BPE route's
    // post-clip counts are ≤ budget BY CONSTRUCTION on every row, and the
    // whitespace route (q121's floor budgeting applied to the same docs)
    // provably over-admits — its clipped docs re-count to 12–15 BPE
    // tokens against the 10-token budget. All segmentations are
    // closed-form under the q119/q135 merge sequence, so the oracle is
    // literal rows.
    QueryDef(
      "q190_bpe_truncation",
      (s, _) => {
        import s.implicits._
        val train = BpeFixture.toDF("id", "text")
        val (merges, dict) = graft.ops.Bpe.train(train, "text", nMerges = 5)
        // sizes under the trained merges: low=2, lower=4, newest=4,
        // widest=4 (in-dict); lowest=2, slower=5, wider=6, zz=3 (OOV)
        val corpus = Seq(
          (0L, "low lower widest zz"),
          (1L, "newest wider"),
          (2L, "slower slower slower"),
          (3L, "zz"),
          (4L, "wider wider")).toDF("id", "text")
        val bpeRoute = graft.ops.Bpe.truncateTokensBpe(
          corpus, "id", "text", dict, merges, maxTokens = 10L)
        val wsClipped = graft.ops.Training.truncateTokens(corpus, "text", maxTokens = 10)
          .select(col("id"), col("text"))
        val wsCounts = graft.ops.Bpe.tokenCountsExact(
            wsClipped, "id", "text", dict, merges)
          .select(col("id"), col("n_tokens").as("ws_bpe"))
        bpeRoute.join(wsCounts, Seq("id"))
          .withColumn("ws_over_admits", col("ws_bpe") > 10L)
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), 'low lower widest', CAST(10 AS BIGINT),
            CAST(13 AS BIGINT), true, CAST(13 AS BIGINT), true),
          (1, 'newest wider', 10, 10, false, 10, false),
          (2, 'slower slower', 10, 15, true, 15, true),
          (3, 'zz', 3, 3, false, 3, false),
          (4, 'wider', 6, 12, true, 12, true))
          AS t(id, text, n_tokens_bpe, n_tokens_full, truncated, ws_bpe, ws_over_admits)
        ORDER BY id""")),

    // BPE-BUDGET BIN PACKING (r13 verdict #3 → r15 —
    // [[graft.ops.Training.packBinsBpe]]): the packing budget is a MODEL
    // CONTEXT budget measured in tokenizer tokens, so the bins assign on
    // [[graft.ops.Bpe.tokenCountsExact]] counts, not whitespace words.
    // The fixture's 400 docs repeat words with closed-form segmentation
    // sizes under the q119-trained merges (low=2, zz=3, newest=4,
    // slower=5, wider=6), so the oracle replays BOTH routes from a
    // literal (id, ws_tokens, bpe_tokens) table: per-bin BPE totals of
    // the BPE route (the hash-gated packing itself), plus two flags —
    // every BPE-route bin stays under budget + max-item (the floor-rule
    // ceiling, 40 + 24), while the WHITESPACE route's bins re-counted in
    // BPE provably blow through it (a word is ≥ 1 BPE token and here
    // averages 4, so "40 whitespace tokens" admits ~160 real ones).
    QueryDef(
      "q198_bpe_bin_packing",
      (s, _) => {
        import s.implicits._
        val train = BpeFixture.toDF("id", "text")
        val (merges, dict) = graft.ops.Bpe.train(train, "text", nMerges = 5)
        val corpus = PackBpeFixture.toDF("id", "text")
        val bpeBins = Training.packBinsBpe(
            corpus, "id", "text", dict, merges, budget = PackBpeBudget)
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("bin_tokens"))
        val wsBins = Training.packBins(
            corpus.select(col("id"), TextStats.tokenCount(col("text")).as("n_ws")),
            "id", "n_ws", budget = PackBpeBudget)
          .join(graft.ops.Bpe.tokenCountsExact(corpus, "id", "text", dict, merges),
            Seq("id"))
          .groupBy(col("shard"), col("bin"))
          .agg(sum(col("n_tokens")).cast("long").as("ws_bin_bpe"))
        val flags = bpeBins.agg(max(col("bin_tokens")).as("__m"))
          .crossJoin(wsBins.agg(max(col("ws_bin_bpe")).as("__w")))
          .select(
            (col("__m") < PackBpeBound).as("bpe_within_bound"),
            (col("__w") >= PackBpeBound).as("ws_over_admits"))
        bpeBins.crossJoin(broadcast(flags))
          .orderBy(col("shard"), col("bin"))
      },
      Some {
        val rows = PackBpeFixture.map { case (i, _) =>
          val sz = PackBpeWords((i % 5).toInt)._2
          val m = i % 4 + 1
          s"($i, $m, ${m * sz})"
        }.mkString(", ")
        s"""
        WITH t(id, ws_tokens, bpe_tokens) AS (VALUES $rows),
        s AS (
          SELECT id, ws_tokens, bpe_tokens,
            ${Training.hashHexSql("id", "graft-pack", hexChars = 1)} AS shard
          FROM t),
        cb AS (
          SELECT shard, id, bpe_tokens,
            sum(bpe_tokens) OVER (PARTITION BY shard ORDER BY id) AS cum
          FROM s),
        bpe_bins AS (
          SELECT shard,
            CAST(floor((cum - bpe_tokens) / $PackBpeBudget) AS BIGINT) AS bin,
            count(*) AS n_docs, CAST(sum(bpe_tokens) AS BIGINT) AS bin_tokens
          FROM cb GROUP BY shard, bin),
        cw AS (
          SELECT shard, id, bpe_tokens, ws_tokens,
            sum(ws_tokens) OVER (PARTITION BY shard ORDER BY id) AS wcum
          FROM s),
        ws_bins AS (
          SELECT shard,
            CAST(floor((wcum - ws_tokens) / $PackBpeBudget) AS BIGINT) AS bin,
            CAST(sum(bpe_tokens) AS BIGINT) AS ws_bin_bpe
          FROM cw GROUP BY shard, bin),
        flags AS (
          SELECT (SELECT max(bin_tokens) FROM bpe_bins) < $PackBpeBound
              AS bpe_within_bound,
            (SELECT max(ws_bin_bpe) FROM ws_bins) >= $PackBpeBound
              AS ws_over_admits)
        SELECT b.shard, b.bin, b.n_docs, b.bin_tokens,
          f.bpe_within_bound, f.ws_over_admits
        FROM bpe_bins b CROSS JOIN flags f
        ORDER BY b.shard, b.bin"""
      }),

    // Mixture EPOCHS (repeat factors) for a token budget — the
    // up-sampling complement of q91's temperature rates: weights rise
    // linearly with the source index ((i+1)/210, replayable from the
    // source name), budget = 2× the observed corpus mass (1-row scalar
    // subquery, q24 pattern), so high-index sources repeat > 2 epochs
    // and trip over_cap while low-index ones stay under — both branches
    // live at any sf (per-source masses stay ~proportional). All doubles
    // are fixed IEEE expressions of exact integer sums → full hash gate.
    QueryDef(
      "q123_mixture_epochs",
      (s, dir) => {
        val weights = (0 until 20).map(i => s"src$i" -> (i + 1) / 210.0).toMap
        Training.mixtureEpochs(Tables.documents(s, dir), "source", "n_chars",
            weights, budgetFactor = 2.0, maxEpochs = 2.0)
          .orderBy(col("source"))
      },
      Some(s"""
        WITH ${OracleFrags.mixtureEpochsCtes("documents")}
        SELECT source, tokens, weight, target_tokens, epochs, over_cap
        FROM mix ORDER BY source""")),

    // Corpus novelty: fraction of each doc's distinct 3-shingles first
    // seen (min doc_id = acquisition order) in that doc. The ~30-word
    // synthetic vocabulary guarantees heavy cross-doc shingle reuse, so
    // scores spread across (0, 1] at any sf: early docs score high, late
    // boilerplate-heavy ones low. Oracle shares the exact shingle CTE
    // (`OracleFrags.shinglesCtes`) with every LSH gate — one tokenizer,
    // one truth.
    QueryDef(
      "q125_novelty",
      (s, dir) =>
        Training.noveltyScore(Tables.documents(s, dir), "doc_id", "text", w = 3)
          .orderBy(col("doc_id")),
      Some(s"""
        WITH ${OracleFrags.shinglesCtes("documents")},
        first AS (
          SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY shingle)
        SELECT s.doc_id,
          CAST(count(*) AS BIGINT) AS n_shingles,
          CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel,
          round(CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 4) AS novelty
        FROM sh s JOIN first f USING (shingle)
        GROUP BY s.doc_id ORDER BY s.doc_id""")),

    // INCREMENTAL novelty — q125's 100 TB operating mode: history (80% of
    // docs, doc_id % 5 ≠ 0) is frozen into the stored first-occurrence
    // index; the new batch (doc_id % 5 = 0) is scored against it with
    // history never rescanned. The oracle is the FULL-corpus recompute
    // (q125's shared shingle CTE) restricted to the batch ids — the two
    // routes must agree bit-for-bit because corpus-first = min(stored
    // first, batch first), for any id interleaving.
    QueryDef(
      "q126_novelty_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val idx = Training.noveltyFirstIndex(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", w = 3)
        Training.noveltyScoreIncremental(
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", idx, w = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${OracleFrags.shinglesCtes("documents")},
        first AS (
          SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY shingle)
        SELECT s.doc_id,
          CAST(count(*) AS BIGINT) AS n_shingles,
          CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel,
          round(CAST(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 4) AS novelty
        FROM sh s JOIN first f USING (shingle)
        WHERE s.doc_id % 5 = 0
        GROUP BY s.doc_id ORDER BY s.doc_id""")),

    // q96's composed curation pipeline WITH the containment stage chained
    // in (VERDICT r7 next #8 — q96 deduped exact-only): PII redaction →
    // exact dedup → CONTAINMENT drop (excerpt/quote removal, the q111 →
    // q114 operator) → quality filter → temperature mixture → split +
    // decontamination → 64-token chunking → per-(split, shard) packing.
    // The input is documents ∪ planted 12-token excerpts (q111's
    // construction, lang carried): excerpts SURVIVE exact dedup (not
    // byte-identical to their source) and would pass the quality filter
    // into the packed output, so the containment stage's drop is
    // structurally non-vacuous — remove it and the bins change. Stage
    // twins are the same fragments gating each stage alone (q21 exact,
    // q114 containment, q28 quality, q91 mixture, q86 decontamination,
    // q74 packing).
    QueryDef(
      "q120_curation_pipeline_r8",
      (s, dir) => {
        val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        val toks = split(lower(regexp_replace(col("text"), "\\s+", " ")), " ")
        val excerpts = base.select(
          (col("doc_id") + lit(100000L)).as("doc_id"),
          concat_ws(" ", slice(toks, 1, 12)).as("text"), col("lang"))
        val input = base.select(col("doc_id"), col("text"), col("lang"))
          .unionByName(excerpts)
        val red = input.select(col("doc_id"),
          TextStats.redactPii(col("text")).as("text"), col("lang"))
        // STAGE BOUNDARY: persist the deduped corpus before containment.
        // The containment stage references its input five times (index
        // self-join sides, sizes, keeper join-back, survivor semi-join),
        // and every downstream stage self-joins again — without the cache
        // leaf, each reference re-optimizes the full upstream tree
        // (union + the redaction regex battery + the dedup semi-join) and
        // Catalyst planning time went superlinear (measured 250 s of
        // driver time before the first job at sf0.01, vs ~17 s of actual
        // execution). At 100 TB this boundary is a staged dataset anyway;
        // the bench/Verify harnesses clear the cache per run.
        val kept = red.join(
          Dedup.exactGroups(red, "doc_id", "text").select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
          .persist()
        val cont = kept.join(
          Dedup.containmentKeepers(kept, "doc_id", "text", minContainment = 0.9,
              capAtObservedMax = true)
            .filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        // same rule at the later multi-referenced boundaries (the mixture
        // reads `quality` twice — rates + keep; decontamination reads
        // `sampled` four times): without the cache leaves the containment
        // subtree re-plans once per reference and AQE shatters the query
        // into ~930 materialized stages
        val quality = cont.filter(TextStats.qualityScore(col("text")) >= 0.99)
          .persist()
        val rates = Training.temperatureRates(quality, "lang", alpha = 0.5)
        val sampled = Training.temperatureKeep(quality, "doc_id", "lang", rates)
          .select(col("doc_id"), col("text"))
          .persist()
        val drop = Training.contaminatedTrainDocs(
            Dedup.wordShingles(sampled, "doc_id", "text", w = 3),
            "doc_id", Training.splitColumn(col("doc_id"), Splits),
            minShared = 2L, capAtObservedMax = true)
          .select(col("train_id").as("doc_id"))
        val clean = sampled.join(drop, Seq("doc_id"), "left_anti")
        val chunks = Training.chunkTokens(clean, "doc_id", "text",
            chunkSize = 64, stride = 64)
          .withColumn("cid", cidCol)
          .withColumn("split", Training.splitColumn(col("doc_id"), Splits))
        val packed = Training.packBins(
            chunks.select(col("cid"), col("split"), col("chunk_tokens")),
            "cid", "chunk_tokens", budget = PackBudget,
            partitionCols = Seq("split"))
          .groupBy(col("split"), col("shard"), col("bin"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_tokens")).cast("long").as("bin_tokens"))
          .orderBy(col("split"), col("shard"), col("bin"))
          // materialize through ONE action, then release the three stage
          // boundaries: the pipeline must not leave cached blocks behind
          // in a long-lived session (VERDICT r8 wrong #2; CacheSpec)
          .localCheckpoint()
        kept.unpersist()
        quality.unpersist()
        sampled.unpersist()
        packed
      },
      Some(s"""
        WITH u AS (
          SELECT doc_id, text, lang FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 100000,
            array_to_string(
              string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' ')[1:12], ' '),
            lang
          FROM documents WHERE text IS NOT NULL),
        red AS (
          SELECT doc_id, ${TextStats.redactPiiSql("text")} AS text, lang
          FROM u),
        ${OracleFrags.exactKeepCtes("red", "kept")},
        ${OracleFrags.containmentDropCtes("kept", "cont", 0.9)},
        ${OracleFrags.qualityCtes("cont", "q", minScore = 0.99)},
        ql AS (
          SELECT q.doc_id, q.text, u.lang FROM q JOIN u USING (doc_id)),
        c AS (SELECT lang, count(*) AS n_docs FROM ql GROUP BY lang),
        m AS (SELECT min(n_docs) AS n_min FROM c),
        r AS (
          SELECT lang, CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE))
                       * 4294967296.0) AS BIGINT) AS thr
          FROM c, m),
        samp AS (
          SELECT ql.doc_id, ql.text FROM ql JOIN r USING (lang)
          WHERE ('0x' || substr(md5('graft-mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr),
        ${OracleFrags.contamPairsCtes("samp", "cp", Splits, minShared = 2L)},
        clean AS (
          SELECT doc_id, text FROM samp
          WHERE doc_id NOT IN (SELECT train_id FROM cp)),
        ${OracleFrags.chunkPackSelect("clean", chunkSize = 64, budget = PackBudget, Splits)}"""))
  ) ++ streamingDefs

  // STREAMING STRATIFIED RESERVOIR SAMPLE (r15 —
  // [[graft.streaming.EventStream.stratifiedSampleIncremental]]): the
  // corpus arrives as 4 hash-split batches; per trigger the store-backed
  // reservoir (O(quota · strata) state, never the corpus) unions the
  // batch, re-ranks by the deterministic hash handles, and diffs —
  // new members upsert, displaced members tombstone. Because
  // stratifiedExact membership is a pure function of the id SET, the
  // maintained table equals the batch q84 sample over the whole corpus
  // for any batch split — q84's oracle runs VERBATIM against the
  // streamed route (two routes, one truth).
  private def streamingDefs: Seq[QueryDef] = Seq(
    QueryDef(
      "q203_stream_stratified_sample",
      (s, dir) => {
        val ss = EventOps.streamSession(s)
        val docs = Tables.documents(ss, dir)
          .select(col("doc_id"), col("lang"), col("source"))
        val srcDir = EventOps.stageArrivalBatchesCached(docs, "graft-s203:", 4, "q203", dir)
        ss.sql("DROP TABLE IF EXISTS q203_sample")
        val ckpt = java.nio.file.Files.createTempDirectory("q203ckpt").toString
        val stream = ss.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val q = graft.streaming.EventStream.stratifiedSampleIncremental(
          stream, "doc_id", "lang", "q203_sample", ExactCounts, ExactDefault,
          // compactEvery=3: the sample table's delta chain folds
          // mid-stream and batch 4 diffs against the folded table
          // (ADVICE r15 — the reservoir sink had no cadence)
          checkpointLocation = Some(ckpt), compactEvery = 3)
        try q.processAllAvailable()
        finally q.stop()
        val result = graft.streaming.EventStream.readStratifiedSample(
            s, "q203_sample", "doc_id", "lang", ExactCounts, ExactDefault)
          .orderBy(col("doc_id"))
          .localCheckpoint()
        s.sql("DROP TABLE IF EXISTS q203_sample")
        Seq(ckpt).foreach(EventOps.rmTree)
        result
      },
      Some(s"""
        WITH r AS (
          SELECT doc_id, lang, source,
            row_number() OVER (PARTITION BY lang
              ORDER BY ${Training.hashHexSql("doc_id", "graft-strat-exact")}, doc_id) AS rn
          FROM documents)
        SELECT doc_id, lang, source FROM r
        WHERE ${Training.stratifiedExactSql("lang", ExactCounts, ExactDefault)}
        ORDER BY doc_id""")),

    // STREAMING WEIGHTED RESERVOIR (q203's Efraimidis–Spirakis sibling —
    // [[graft.streaming.EventStream.weightedSampleIncremental]]): the
    // maintained top-100-by-ES-key table must equal the batch q177 draw
    // over the whole corpus for any batch split — q177's oracle VERBATIM.
    QueryDef(
      "q204_stream_weighted_sample",
      (s, dir) => {
        val ss = EventOps.streamSession(s)
        val docs = Tables.documents(ss, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val srcDir = EventOps.stageArrivalBatchesCached(docs, "graft-s204:", 4, "q204", dir)
        ss.sql("DROP TABLE IF EXISTS q204_sample")
        val ckpt = java.nio.file.Files.createTempDirectory("q204ckpt").toString
        val stream = ss.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val q = graft.streaming.EventStream.weightedSampleIncremental(
          stream, "doc_id", "n_chars", "q204_sample", n = 100,
          // mid-stream sample-table fold crossed by batch 4 (see q203)
          checkpointLocation = Some(ckpt), compactEvery = 3)
        try q.processAllAvailable()
        finally q.stop()
        val result = graft.streaming.EventStream.readWeightedSample(
            s, "q204_sample", "doc_id", "n_chars", n = 100)
          .orderBy(col("doc_id"))
          .localCheckpoint()
        s.sql("DROP TABLE IF EXISTS q204_sample")
        Seq(ckpt).foreach(EventOps.rmTree)
        result
      },
      Some(s"""
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars FROM documents
          WHERE n_chars > 0
          ORDER BY ${Training.weightedSampleKeySql("doc_id", "n_chars")} DESC, doc_id
          LIMIT 100)
        ORDER BY doc_id"""))
  )
}
