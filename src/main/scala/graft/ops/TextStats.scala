package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` Columns — no UDFs — so
  * the whole pipeline stays inside WholeStageCodegen and scales map-side
  * (zero shuffles until an explicit aggregate).
  */
object TextStats {

  /** Whitespace tokens of the canonical (lowercased, space-collapsed) form. */
  def tokens(text: Column): Column = split(Dedup.canonical(text), " ")

  /** Per-document UNIGRAM LOG-PROBABILITY under the corpus's own empirical
    * unigram model: mean over the document's tokens of
    * ln(count(token) / total_tokens) — the cheapest model-based quality
    * signal (gibberish and boilerplate-free rare-token soup score far
    * below plain prose; the perplexity-filter idea of quality pipelines,
    * reduced to its unigram core so it is exactly replayable in SQL).
    *
    * Scale shape: one explode + (token → count) map-combinable aggregate
    * builds the frequency dictionary — Zipf-sized, BROADCAST back to the
    * exploded corpus (the `Bpe.tokenCounts` join rule: the corpus never
    * shuffles on words); the total rides the 1-row broadcast scalar
    * (q24 cap pattern); the per-doc mean is one keyed aggregate on id.
    *
    * The hint is CONDITIONAL (VERDICT r11 next #6): the broadcast
    * assumption — the dictionary fits an executor — holds for natural-
    * language vocabularies but NOT for web-scale corpora full of
    * unbounded junk tokens, where the hint would OOM the driver. The
    * dictionary is therefore materialized (localCheckpoint — vocab-sized,
    * lineage-free) and counted once; at or under `broadcastVocabLimit`
    * rows it broadcasts, above it the join falls back to the one
    * word-keyed shuffle. Both paths are the same aggregate and hash
    * identically (q148 vs q158); TextStatsSpec pins the plan split.
    * `broadcastVocabLimit = 0` forces the shuffle path.
    */
  def unigramLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      broadcastVocabLimit: Long = 10000000L): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val hinted = if (freq.count() <= broadcastVocabLimit) broadcast(freq) else freq
    // total = Σ counts over the DICTIONARY, not a third corpus explode —
    // the dictionary is Zipf-sized, the corpus is not
    val total = freq.agg(sum(col("__c")).cast("double").as("__n"))
    toks
      .join(hinted, "__tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(log(col("__c").cast("double") / col("__n"))), 4).as("logprob"))
  }

  /** Per-document BIGRAM CONDITIONAL LOG-PROBABILITY under the corpus's own
    * empirical bigram model: mean over the document's adjacent token pairs
    * of ln(c(w1 w2) / c(w1 ·)) — c(w1 w2) the corpus count of the bigram,
    * c(w1 ·) the corpus count of bigrams headed by w1. [[unigramLogProb]]'s
    * next-order sibling: the unigram score flags rare-token soup, the
    * bigram score additionally flags WORD-SALAD (plausible tokens in
    * implausible order — shuffled text keeps its unigram score and craters
    * here). No smoothing: the corpus scores itself, so every observed
    * bigram has count ≥ 1 and the conditional is always defined.
    *
    * Scale shape: ONE bigram stream per document from the codegen'd
    * `word_shingles(text, 2)` expression (multiplicity kept — it is the
    * model's event stream); the bigram dictionary is one map-combinable
    * aggregate, head counts DERIVE from the dictionary (a vocab-sized
    * aggregate — no second corpus pass); both join back under the same
    * conditional-broadcast rule as [[unigramLogProb]] (dictionary counted
    * once; at or under `broadcastVocabLimit` rows it broadcasts, above it
    * the two joins take word-keyed shuffles — head rows ≤ bigram rows, so
    * one count decides both). Docs with < 2 tokens have no bigrams and are
    * absent from the output, like [[repetitionStats]]' < 3-token rule.
    */
  def bigramLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      broadcastVocabLimit: Long = 10000000L): DataFrame = {
    val bigrams = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.WordShinglesExpr.word_shingles(col(textCol), lit(2)))
          .as("__bg"))
    val freq = bigrams.groupBy(col("__bg")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    // tokens never contain spaces, so the head is everything before the
    // single separator the shingle joined with
    val heads = freq
      .groupBy(substring_index(col("__bg"), " ", 1).as("__h"))
      .agg(sum(col("__c")).as("__hc"))
    val fits = freq.count() <= broadcastVocabLimit // heads ≤ bigrams: one count decides both
    val fHint = if (fits) broadcast(freq) else freq
    val hHint = if (fits) broadcast(heads) else heads
    bigrams
      .join(fHint, "__bg")
      .withColumn("__h", substring_index(col("__bg"), " ", 1))
      .join(hHint, "__h")
      .groupBy(col(idCol))
      .agg(round(avg(log(col("__c").cast("double") / col("__hc").cast("double"))), 4)
        .as("bigram_logprob"))
  }

  /** HTML → text for corpus ingestion: drop `<script>`/`<style>` blocks
    * wholesale (their BODIES are code, not prose — and stripping tags
    * first would leak `if (x<2 && y>1)` into the text), then every
    * remaining tag, decode the six core entities (`&amp;` LAST, so
    * `&amp;lt;` decodes to the literal text `&lt;`, not to `<`), and
    * collapse the whitespace the removals leave behind.
    *
    * Pure codegen'd Column chain (regexp/replace built-ins, no UDF), and
    * every pattern is RE2-compatible — no backreferences, lazy `.*?`
    * only — so the DuckDB oracle applies the IDENTICAL patterns (q170).
    * Deliberately a boilerplate stripper, not an HTML5 parser: malformed
    * nesting degrades to extra whitespace, never to an error.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&") // &amp; last
    val decoded = entities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words plus intra-word breaks at
    * letter/digit and case boundaries — a cheap deterministic proxy for
    * tokenizer budget accounting (no model shipped).
    */
  def subwordCountEstimate(text: Column): Column =
    size(split(
      regexp_replace(regexp_replace(trim(text), "([a-z])([A-Z])", "$1 $2"),
        "([A-Za-z])([0-9])|([0-9])([A-Za-z])", "$1$3 $2$4"),
      "\\s+"))

  /** Repetition-based quality stats per document — the Gopher/MassiveText
    * repetition filters (Rae et al. 2021, appendix A1.1) re-expressed over
    * word n-grams:
    *
    *  - `top2_frac`: occurrences of the single most frequent 2-gram as a
    *    fraction of all 2-gram occurrences (high → looping/templated text);
    *  - `dup3_frac`: fraction of 3-gram occurrences beyond each gram's
    *    first (high → internally repetitive text).
    *
    * Scale shape: n-gram streams come from the codegen'd `word_shingles`
    * expression (NOT deduplicated — multiplicity is the signal here, unlike
    * [[Dedup.wordShingles]]); the only shuffles are the two (id, gram)
    * aggregates, both map-side combinable, and nothing ever compares
    * documents to each other. Documents with fewer than 3 tokens have no
    * 3-grams and are dropped (they get filtered by the length rule long
    * before repetition matters).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def gramStats(w: Int, top: String, dup: String): DataFrame =
      docs
        .select(col(idCol),
          explode(graft.functions.WordShinglesExpr.word_shingles(col(textCol), lit(w)))
            .as("gram"))
        .groupBy(col(idCol), col("gram"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg(
          (max(col("c")).cast("double") / sum(col("c"))).as(top),
          ((sum(col("c")) - countDistinct(col("gram"))).cast("double") / sum(col("c")))
            .as(dup))
    gramStats(2, "top2_frac", "dup2_frac").drop("dup2_frac")
      .join(gramStats(3, "top3_frac", "dup3_frac").drop("top3_frac"), idCol)
  }

  /** Stopword set used by the quality features (shared with the q28 oracle
    * so both sides compute from the same list).
    */
  val qualityStopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality-score feature columns (length / punctuation / stopword ratios).
    * Returns a struct so callers can select individual features or the
    * composite score in one pass.
    */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = tokens(text)
    val nToks = size(toks).cast("double")
    val meanTokLen = nChars / greatest(nToks, lit(1.0))
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val stopHits = filter(toks, t => t.isin(TextStats.qualityStopwords.map(lit(_)): _*))
    val stopRatio = size(stopHits).cast("double") / greatest(nToks, lit(1.0))
    struct(
      nToks.as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
      stopRatio.as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: documents with reasonable token
    * length and some stopword mass score high; alphabet soup scores low.
    * Deterministic and documented here as THE scoring function (tests pin
    * its behavior; there is no hidden model).
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenOk = when(f("n_tokens") >= 10 && f("n_tokens") <= 100000, 1.0).otherwise(0.3)
    val tokOk = when(f("mean_token_len") >= 2.5 && f("mean_token_len") <= 12.0, 1.0).otherwise(0.4)
    val stopOk = when(f("stopword_ratio") >= 0.01, 1.0).otherwise(0.5)
    round(lenOk * 0.4 + tokOk * 0.4 + stopOk * 0.2, 4)
  }

  /** Gopher-style rule-based document filter (Rae et al. 2021, appendix
    * A1.1 — the MassiveText rule battery, the industry-standard pre-filter
    * that runs BEFORE any learned quality model), emitted per-rule so the
    * pipeline can report WHY a document was dropped, not just that it was:
    *
    *  - `word_count_ok`:    minWords ≤ n_words ≤ maxWords;
    *  - `mean_word_len_ok`: mean word length in [3, 10] characters;
    *  - `symbol_ok`:        (# occurrences of '#' + of '...') / n_words
    *                        ≤ 0.1 (symbol-to-word ratio);
    *  - `bullet_ok`:        ≤ 90% of lines start with a bullet ('• ');
    *  - `alpha_ok`:         ≥ 80% of words contain ≥ 1 letter a–z;
    *  - `stop_ok`:          ≥ minStopHits DISTINCT words from `stopWords`
    *                        (Gopher's "2 of 8 stop words" rule; the list is
    *                        a parameter because it is corpus/language-bound);
    *  - `keep`:             the conjunction.
    *
    * Every measure is exact integer arithmetic (counts, char totals) with
    * at most ONE correctly-rounded double division per ratio — bit-stable
    * across IEEE engines, q79's rule — so the whole battery is
    * hash-gatable. Repetition rules (the other half of Gopher A1.1) are
    * [[repetitionStats]]' job; composing both is one join on the id.
    *
    * Scale shape: pure map-side Columns over the scan (tokens/lines via
    * codegen'd split; HOF filters iterate one document's array in-task) —
    * no shuffle, no UDF; at 100 TB this runs inside the read stage at scan
    * bandwidth, which is exactly why production pipelines run the rule
    * battery first and spend model inference only on survivors.
    *
    * Words are the engine-wide canonical whitespace tokens ([[tokens]]);
    * lines split the RAW text on '\n' (canonicalization collapses
    * newlines, so line structure must be read first).
    */
  def gopherRules(
      docs: DataFrame, idCol: String, textCol: String,
      stopWords: Seq[String], minStopHits: Int = 2,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    // total word chars = canonical length minus the (n-1) separator spaces
    val wordChars = (length(Dedup.canonical(text)) - (size(toks) - 1)).cast("long")
    val meanLen = round(wordChars.cast("double") / nWords.cast("double"), 4)
    val hashCnt = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellipsisCnt =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val symbolRatio =
      round((hashCnt + ellipsisCnt).cast("double") / nWords.cast("double"), 4)
    val lines = split(text, "\n")
    val nBullet = size(filter(lines, l => l.startsWith("• ")))
    val bulletFrac = round(nBullet.cast("double") / size(lines).cast("double"), 4)
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]")))
    val alphaFrac = round(nAlpha.cast("double") / nWords.cast("double"), 4)
    val stopDistinct =
      size(array_intersect(array_distinct(toks), array(stopWords.map(lit(_)): _*)))
        .cast("long")
    val flags: Seq[(String, Column)] = Seq(
      "word_count_ok" -> (nWords >= minWords && nWords <= maxWords),
      "mean_word_len_ok" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "symbol_ok" -> (symbolRatio <= 0.1),
      "bullet_ok" -> (bulletFrac <= 0.9),
      "alpha_ok" -> (alphaFrac >= 0.8),
      "stop_ok" -> (stopDistinct >= minStopHits))
    docs.select(
      (Seq(col(idCol), nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
        alphaFrac.as("alpha_frac"), stopDistinct.as("stop_distinct")) ++
        flags.map { case (n, c) => c.as(n) } :+
        flags.map(_._2).reduce(_ && _).as("keep")): _*)
  }

  /** Language-ID by stopword-profile voting: score each candidate language
    * by how many of its top stopwords occur in the token set; highest score
    * wins, ties broken by language code. An n-gram-free heuristic that is a
    * single map-side pass (profiles are inlined literals, no join).
    *
    * Ten languages × a few dozen high-frequency function words each — the
    * broadcast-dictionary path ([[langIdTable]]) is shaped for dictionaries
    * of this size and beyond (the per-row inline [[langId]] form stays
    * equivalence-tested against it but is only sane for small profile
    * sets). Words are common written-frequency stopwords; diacritics are
    * kept (tokens are whitespace-split, not ASCII-folded), and forms that
    * need apostrophes are skipped so the q27 oracle's generated SQL VALUES
    * list stays quote-free.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it",
      "was", "on", "as", "are", "at", "be", "this", "have", "from", "or",
      "had", "by", "not", "but", "what", "all", "were", "when", "your", "can"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour",
      "dans", "qui", "sur", "pas", "plus", "par", "avec", "son", "ils", "au",
      "se", "ne", "ce", "il", "elle", "nous", "vous", "mais", "ou", "donc"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "para",
      "en", "no", "se", "del", "las", "por", "con", "su", "al", "lo",
      "como", "más", "pero", "sus", "le", "ya", "este", "sí", "porque", "esta"),
    "de" -> Seq("der", "die", "das", "und", "von", "ein", "eine", "ist", "zu", "mit",
      "den", "nicht", "sie", "es", "sich", "auf", "für", "als", "auch", "werden",
      "aus", "er", "hat", "dass", "war", "wie", "im", "wir", "einen", "nach"),
    "it" -> Seq("il", "di", "che", "la", "per", "un", "in", "una", "sono", "non",
      "con", "si", "da", "come", "anche", "più", "del", "della", "gli", "nel"),
    "pt" -> Seq("o", "de", "a", "e", "que", "do", "da", "em", "um", "para",
      "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as"),
    "nl" -> Seq("de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
      "zijn", "met", "die", "voor", "niet", "aan", "er", "om", "ook", "maar"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
      "den", "till", "inte", "om", "ett", "han", "var", "jag", "sig", "från"),
    "pl" -> Seq("nie", "to", "się", "na", "co", "jest", "do", "tak", "jak", "ale",
      "mnie", "za", "ja", "czy", "tym", "tylko", "po", "jego", "był", "przez"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人", "有", "他", "这",
      "中", "大", "来", "上", "国", "个", "到", "说", "们", "为"),
  )

  def langId(text: Column): Column = {
    val toks = tokens(text)
    // one struct per language, argmax via a single greatest(): struct
    // ordering compares (score, -rank) so the highest score wins and ties
    // go to the lexicographically FIRST language (rank is the sorted
    // position). A pairwise when()-reduce here re-references both operands
    // per step — an EXPONENTIALLY duplicated expression tree that OOMs the
    // analyzer once profiles grow past a handful of languages.
    val scores = stopwordProfiles.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, words), rank) =>
        val s = words.map(w => when(array_contains(toks, w), 1).otherwise(0)).reduce(_ + _)
        struct(s.as("score"), lit(-rank).as("neg_rank"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best("score") === 0, lit("und")).otherwise(best("lang"))
  }

  /** 64-bit-hex document fingerprint of the canonical form (first 16 hex
    * chars of md5) — the cheap exact-dedup / provenance key.
    */
  def fingerprint(text: Column): Column =
    substring(md5(Dedup.canonical(text)), 1, 16)

  /** PII scrub patterns, in REPLACEMENT ORDER (emails first: an address
    * must not survive long enough for its host part to be half-eaten by
    * the IP rule). One list drives both the Spark columns and the DuckDB
    * oracle SQL, so the twins cannot drift.
    *
    * Pattern dialect: the intersection of Java regex (Spark) and RE2
    * (DuckDB) — character classes, bounded repetition, `\b`, optional
    * groups; NO lookaround or backreferences (RE2 has neither). For these
    * constructs the two engines match identically (greedy, non-overlapping,
    * left-to-right), which the q90 gate pins corpus-wide.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{1,3}-\\d{3}-\\d{3,4}(-\\d{3,4})?\\b", "<PHONE>"))

  /** Match count for one PII category on the ORIGINAL text (counts are
    * per-category and independent; redaction order doesn't affect them).
    */
  def piiCount(text: Column, category: String): Column = {
    val (_, pat, _) = piiPatterns.find(_._1 == category)
      .getOrElse(sys.error(s"unknown PII category: $category"))
    regexp_count(text, lit(pat)).cast("long")
  }

  /** The text with every PII match replaced by its typed token — a pure
    * map-side column (stays inside WholeStageCodegen; no shuffle, no UDF).
    * Idempotent: replacement tokens contain no `@`, digits-with-dots, or
    * `+`, so a second pass is a no-op (TextStatsSpec pins it).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, token)) =>
      regexp_replace(c, pat, token)
    }

  /** DuckDB twins of [[piiCount]] / [[redactPii]], generated from the same
    * pattern list (the q27 generated-dictionary rule).
    */
  def piiCountSql(textExpr: String, category: String): String = {
    val (_, pat, _) = piiPatterns.find(_._1 == category)
      .getOrElse(sys.error(s"unknown PII category: $category"))
    s"len(regexp_extract_all($textExpr, '$pat'))"
  }

  def redactPiiSql(textExpr: String): String =
    piiPatterns.foldLeft(textExpr) { case (e, (_, pat, token)) =>
      s"regexp_replace($e, '$pat', '$token', 'g')"
    }

  /** Scale-path language-ID: explode tokens → broadcast-join the stopword
    * dictionary → count votes per (doc, lang) → argmax. Same decision rule
    * as [[langId]] (score desc, lang asc, 0 hits → "und") but linear in
    * token count instead of |langs|×|profile| expression evaluations per
    * row — the shape that holds when the dictionary grows to thousands of
    * words and the corpus to 100 TB.
    */
  /** MIXED-LANGUAGE detection — [[langIdTable]] applied per SPAN instead
    * of per document: chunk each document into non-overlapping `w`-token
    * spans (the native `word_chunks` front), language-vote every span
    * against the stopword dictionary, and report the per-document span
    * consensus: span count, distinct span languages, the majority
    * language (ties to the smallest) and its fraction. A document whose
    * spans disagree is code-switched or a concatenation artifact — the
    * filter multilingual curation needs, invisible to whole-document
    * voting (one dominant language swallows the embedded second one;
    * TextStatsSpec plants exactly that and pins the split).
    *
    * Scale shape: chunking is scan-local; the dictionary join is the
    * broadcast [[langIdTable]] route keyed by (doc, span); the only
    * shuffles are the (doc, span, lang) vote count and the final per-doc
    * consensus aggregate, both map-combinable.
    */
  def mixedLanguage(
      docs: DataFrame, idCol: String, textCol: String, w: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = broadcast(
      stopwordProfiles.toSeq
        .flatMap { case (lang, ws) => ws.map(word => (word, lang)) }
        .toDF("tok", "dict_lang"))
    val chunks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(graft.functions.WordChunksExpr.word_chunks(col(textCol), lit(w)))
          .as(Seq("__ck", "__chunk")))
    val votes = chunks
      .select(col(idCol), col("__ck"),
        explode(array_distinct(split(col("__chunk"), " "))).as("tok"))
      .join(dict, "tok")
      .groupBy(col(idCol), col("__ck"), col("dict_lang"))
      .agg(count(lit(1)).as("hits"))
    val best = votes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol), col("__ck"))
          .orderBy(col("hits").desc, col("dict_lang"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("__ck"), col("dict_lang"))
    val labeled = chunks.select(col(idCol), col("__ck"))
      .join(best, Seq(idCol, "__ck"), "left")
      .withColumn("span_lang", coalesce(col("dict_lang"), lit("und")))
    val perLang = labeled.groupBy(col(idCol), col("span_lang"))
      .agg(count(lit(1)).as("__n"))
    perLang.groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_spans"),
        count(lit(1)).as("n_langs"),
        // majority by count, tie to the SMALLEST lang: min over (−n, lang)
        min(struct((lit(0L) - col("__n")).as("__neg"), col("span_lang"), col("__n")))
          .as("__m"))
      .select(col(idCol),
        col("n_spans"), col("n_langs"),
        col("__m.span_lang").as("majority_lang"),
        round(col("__m.__n").cast("double") / col("n_spans"), 4).as("majority_frac"))
  }

  def langIdTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = broadcast(
      stopwordProfiles.toSeq
        .flatMap { case (lang, ws) => ws.map(w => (w, lang)) }
        .toDF("tok", "dict_lang"))
    val votes = docs
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .join(dict, "tok")
      .groupBy(col(idCol), col("dict_lang"))
      .agg(count(lit(1)).as("hits"))
    val best = votes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol))
          .orderBy(col("hits").desc, col("dict_lang"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("dict_lang").as("predicted_lang"))
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .withColumn("predicted_lang", coalesce(col("predicted_lang"), lit("und")))
  }
}
