package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts canonical whitespace tokens") {
    val df = Seq("  Hello   big  World  ").toDF("t")
    // canonical collapses runs; leading/trailing spaces yield empty edge
    // tokens which split() keeps — pin the exact behavior the oracle uses
    val n = df.select(TextStats.tokenCount($"t")).head().getInt(0)
    assert(n === 5)
    assert(Seq("a b c").toDF("t").select(TextStats.tokenCount($"t")).head().getInt(0) === 3)
  }

  test("langId votes by stopword profile; und when no evidence") {
    val cases = Seq(
      "the cat sat on the mat and it is happy" -> "en",
      "le chat est sur la table et il est content pour un moment" -> "fr",
      "el gato es feliz y la casa es grande para un perro" -> "es",
      "der hund und die katze sind ein team mit freude" -> "de",
      "il gatto non è felice perché anche la casa è più piccola del previsto che sono" -> "it",
      "o gato não está em casa e um cachorro que corre para o mais alto" -> "pt",
      "de kat is niet in het huis en dat is ook niet voor een hond met die baas" -> "nl",
      "och det är en katt som inte är på huset för att han var från staden med jag" -> "sv",
      "to nie jest tak jak się wydaje ale tylko ja wiem czy to był jego pomysł" -> "pl",
      "zzz qqq xxx" -> "und")
    val df = cases.map(_._1).toDF("t")
    val got = df.select(TextStats.langId($"t")).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("qualityScore prefers normal prose over degenerate text") {
    val good = "the quick brown fox jumps over the lazy dog and keeps running until the morning light arrives"
    val bad = "x y z q w e r t y u"   // short tokens, no stopwords... actually has none
    val df = Seq(good, bad).toDF("t")
    val scores = df.select(TextStats.qualityScore($"t")).as[Double].collect()
    assert(scores(0) > scores(1), s"good=${scores(0)} bad=${scores(1)}")
  }

  test("fingerprint is whitespace/case-invariant and 16 hex chars") {
    val df = Seq(("Hello   World", "hello world")).toDF("a", "b")
    val r = df.select(TextStats.fingerprint($"a"), TextStats.fingerprint($"b")).head()
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0).matches("[0-9a-f]{16}"))
  }

  test("langIdTable (dictionary-join scale path) agrees with the Column langId") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it is happy"),
      (2L, "le chat est sur la table et il est content pour un moment"),
      (3L, "el gato es feliz y la casa es grande para un perro"),
      (4L, "der hund und die katze sind ein team mit freude"),
      (5L, "zzz qqq xxx")).toDF("doc_id", "text")
    val colVersion = docs.select($"doc_id", TextStats.langId($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val joinVersion = TextStats.langIdTable(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(joinVersion === colVersion)
  }

  test("subwordCountEstimate splits case and letter/digit boundaries") {
    val df = Seq("fooBar baz42qux").toDF("t")
    // fooBar → foo Bar; baz42qux → baz 42 qux → 5 pieces
    assert(df.select(TextStats.subwordCountEstimate($"t")).head().getInt(0) === 5)
  }

  test("redactPii scrubs all three categories; counts match; idempotent") {
    val df = Seq(
      "write alice.smith+x@corp.example.org or bob@a.io, host 192.168.0.1, tel +33-555-0142",
      "no pii here at all",
      // an @ followed by a bare IP is NOT an email (no letter TLD) — the
      // IP rule handles it after the email pass leaves it alone
      "ping user@10.0.0.1 now").toDF("t")
      .select($"t",
        TextStats.piiCount($"t", "email").as("ne"),
        TextStats.piiCount($"t", "ipv4").as("ni"),
        TextStats.piiCount($"t", "phone").as("np"),
        TextStats.redactPii($"t").as("red"))
    val rows = df.collect()
    assert((rows(0).getLong(1), rows(0).getLong(2), rows(0).getLong(3)) === ((2L, 1L, 1L)))
    assert(rows(0).getString(4) ===
      "write <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>")
    assert((rows(1).getLong(1), rows(1).getLong(2), rows(1).getLong(3)) === ((0L, 0L, 0L)))
    assert(rows(1).getString(4) === "no pii here at all")
    assert(rows(2).getString(4) === "ping user@<IP> now")
    // idempotence: tokens introduce no new matches
    val twice = df.select(TextStats.redactPii($"red").as("r2"), $"red")
    assert(twice.filter($"r2" =!= $"red").count() === 0L)
  }

  test("repetitionStats: closed-form fractions on looping vs clean text") {
    val docs = Seq(
      // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b" 3/5;
      // 3-grams = [a b a, b a b, a b a, b a b] → 4 occurrences, 2 distinct
      // → dup3 = (4-2)/4 = 0.5
      (1L, "a b a b a b"),
      // all-distinct grams: top2 = 1/4, dup3 = 0
      (2L, "v w x y z"),
      // 2 tokens: has a 2-gram but no 3-gram → dropped by the inner join
      (3L, "only two")).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((3.0 / 5.0, 0.5)),
      2L -> ((0.25, 0.0))))
  }

  test("gopherRules: each rule fires on its closed-form violator and only there") {
    // 60 clean words containing both stop words → every rule passes
    val clean = (Seq("the", "a") ++ (1 to 58).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      (1L, clean),
      (2L, "the a short doc"),                        // word-count floor
      (3L, (1 to 60).map(_ => "# the a").mkString(" ")), // symbol soup (ratio 1/3)
      (4L, "• the\n• a\n• " + (1 to 58).map(i => s"w$i").mkString("\n• ")), // all-bullet lines
      (5L, clean.replace("the a ", "zz qq "))          // no stop words
    ).toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs, "doc_id", "text",
        stopWords = Seq("the", "a"), minStopHits = 2)
      .collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): Seq[Boolean] =
      (7 to 12).map(i => out(id).getBoolean(i))
    assert(flags(1L) === Seq(true, true, true, true, true, true))
    assert(out(1L).getBoolean(13), "clean doc must keep")
    assert(!out(2L).getBoolean(7) && !out(2L).getBoolean(13), "short doc fails word count")
    assert(!out(3L).getBoolean(9), "symbol soup fails symbol ratio")
    // '#' tokens also drag alpha below 0.8? 1/3 symbols → alpha 2/3 < 0.8
    assert(!out(3L).getBoolean(11))
    assert(!out(4L).getBoolean(10), "bullet doc fails bullet_frac")
    assert(out(4L).getDouble(4) === 1.0)
    assert(!out(5L).getBoolean(12) && out(5L).getLong(6) === 0L, "no stop hits")
    // mean word length: doc 3 tokens are {#, the, a} → mean (1+3+1)/3 = 5/3 < 3
    assert(!out(3L).getBoolean(8))
  }

  test("unigramLogProb dictionary join: broadcast under the vocab limit, shuffle above") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "a d"), (3L, "b b e")).toDF("doc_id", "text")
    // kill auto-broadcast so the PLAN reflects the operator's own hint
    // decision, not the optimizer's size estimate of a toy fixture
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      def planOf(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      val bc = TextStats.unigramLogProb(docs, "doc_id", "text")
      assert(planOf(bc).contains("BroadcastHashJoin"),
        "under the limit the dictionary must broadcast")
      val sh = TextStats.unigramLogProb(docs, "doc_id", "text", broadcastVocabLimit = 0L)
      assert(!planOf(sh).contains("BroadcastHashJoin"),
        "over the limit the dictionary join must fall back to the shuffle")
      // both paths produce the same logprobs
      val a = bc.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = sh.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a === b)
    } finally spark.conf.set(key, prev)
  }

  test("mixedLanguage flags code-switched docs that whole-doc voting swallows") {
    import spark.implicits._
    val en = "the cat and the dog of this house is that for with it was on"
    val fr = "le chat et la maison de une est que pour dans qui sur pas plus"
    val docs = Seq(
      (1L, s"$en $en"),  // monolingual: two en spans
      (2L, s"$en $fr"),  // code-switched: one en span + one fr span
      (3L, "zz qq ww")   // no dictionary hits at all
    ).toDF("doc_id", "text")
    val got = TextStats.mixedLanguage(docs, "doc_id", "text", w = 15)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((2L, 1L, "en", 1.0)))
    assert(got(2L) === ((2L, 2L, "en", 0.5)),
      s"code-switch must split the spans: ${got(2L)}")
    assert(got(3L) === ((1L, 1L, "und", 1.0)))
    // the whole-doc vote on doc 2 reports just the majority language —
    // exactly what the span consensus exists to see through
    val whole = TextStats.langIdTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(whole(2L) === "en" || whole(2L) === "fr")
  }

  test("stripHtml drops script/style bodies, tags, and decodes entities in safe order") {
    import spark.implicits._
    val cases = Seq(
      // script body with < and && must vanish wholesale, not leak as text
      ("<p>hi</p><script>if (a<2 && b>1) { f(); }</script><p>there</p>", "hi there"),
      ("<style>p { color: red }</style><b>bold</b>", "bold"),
      // &amp; decodes LAST: &amp;lt; is the literal text "&lt;", not "<"
      ("&amp;lt; &lt; &gt; &quot;q&#39;s&quot; &nbsp;x", "&lt; < > \"q's\" x"),
      // multi-line tag + attribute noise
      ("<a\n  href=\"x\"\n>link</a>", "link"),
      // plain text is a fixed point
      ("already clean text", "already clean text"))
    val got = cases.map(_._1).toDF("h")
      .select(TextStats.stripHtml(col("h")).as("c")).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("bigramLogProb catches word-salad that unigram scoring cannot") {
    import spark.implicits._
    // a corpus of the SAME sentence repeated, plus one shuffled copy: the
    // shuffled doc keeps the exact unigram multiset (identical unigram
    // score) but its bigrams are corpus-rare → bigram score must drop
    val sentence = "the quick brown fox jumps over the lazy dog"
    val shuffled = "dog the over quick lazy jumps fox brown the"
    val docs = ((1L to 8L).map(i => (i, sentence)) :+ (9L, shuffled))
      .toDF("doc_id", "text")
    val uni = TextStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(9L) === uni(1L), "shuffling must not move the unigram score")
    val bi = TextStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(9L) < bi(1L),
      s"word-salad must score below prose: salad=${bi(9L)} prose=${bi(1L)}")
    // docs with < 2 tokens have no bigrams and are absent, like the
    // repetitionStats < 3-token rule
    val tiny = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
    val scored = TextStats.bigramLogProb(tiny, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(scored === Set(2L))
    // conditional broadcast: same split rule as the unigram dictionary
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      def planOf(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      assert(planOf(TextStats.bigramLogProb(docs, "doc_id", "text"))
        .contains("BroadcastHashJoin"))
      val sh = TextStats.bigramLogProb(docs, "doc_id", "text", broadcastVocabLimit = 0L)
      assert(!planOf(sh).contains("BroadcastHashJoin"))
      val shv = sh.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(shv === bi)
    } finally spark.conf.set(key, prev)
  }
}
