package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Semantics of the training-data curation primitives ([[Training]]):
  * determinism under reshuffles, split completeness, nested-sample
  * monotonicity, packing invariants, chunk reassembly, and a brute-force
  * twin for the decontamination join.
  */
class TrainingSpec extends SparkSpec {

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hexThreshold maps fractions to the expected hex boundaries") {
    assert(Training.hexThreshold(0.0) === "00000000")
    assert(Training.hexThreshold(0.5) === "80000000")
    assert(Training.hexThreshold(1.0) === "g", "rate 1 must keep 'ffffffff' rows too")
    // 'g' sorts above every hex digit, so f=1 keeps everything
    assert("ffffffff" < "g")
  }

  test("splitColumn: every row labeled, fractions roughly honored, stable under repartition") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val labeled = docs.select(col("doc_id"),
      Training.splitColumn(col("doc_id"), fracs).as("split"))
    val byLabel = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byLabel.values.sum
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train").toDouble / n > 0.7 && byLabel("train").toDouble / n < 0.9)
    // determinism: the label is a pure function of the id — a different
    // physical partitioning must produce the identical assignment
    val again = docs.repartition(13).select(col("doc_id"),
      Training.splitColumn(col("doc_id"), fracs).as("split"))
    assert(labeled.except(again).isEmpty && again.except(labeled).isEmpty)
  }

  test("stratifiedKeep: samples are nested across rates and exact on reruns") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    def sample(rate: Double) = docs.filter(
      Training.stratifiedKeep(col("doc_id"), col("lang"), Map.empty, defaultRate = rate))
    val s25 = sample(0.25).collect().map(_.getLong(0)).toSet
    val s50 = sample(0.50).collect().map(_.getLong(0)).toSet
    // hash-threshold sampling gives NESTED samples: raising the rate only
    // adds rows — the property partition-seeded rand() sampling lacks
    assert(s25.subsetOf(s50), "rate-0.25 sample not contained in rate-0.5 sample")
    assert(s25.nonEmpty && s50.size > s25.size)
    assert(sample(0.25).collect().map(_.getLong(0)).toSet === s25, "rerun changed the sample")
  }

  test("packBins: bins are contiguous per shard, doc counts add up, budget shapes fills") {
    val budget = 256L
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), TextStats.tokenCount(col("text")).as("n_tokens"))
    val packed = Training.packBins(docs, "doc_id", "n_tokens", budget).cache()
    try {
      assert(packed.count() === docs.count(), "packing must not drop or duplicate docs")
      val perShard = packed.groupBy("shard")
        .agg(countDistinct(col("bin")).as("n_bins"), max(col("bin")).as("max_bin"),
          sum(col("n_tokens")).as("toks"))
        .collect()
      perShard.foreach { r =>
        // start offsets are a running sum → bin ids are 0..max with no gaps
        assert(r.getLong(1) === r.getLong(2) + 1,
          s"shard ${r.getString(0)}: bins not contiguous")
        // every bin holds one budget's worth of start-offsets, so the bin
        // count is exactly ceil(shard_tokens / budget) when the last doc
        // ends the shard — at minimum it can't exceed total/budget + 1
        assert(r.getLong(1) <= r.getLong(3) / budget + 1)
      }
    } finally packed.unpersist()
  }

  test("chunkTokens with stride=size reassembles exactly (no token lost or duplicated)") {
    val docs = Tables.documents(spark, sf())
    val back = Training.chunkTokens(docs, "doc_id", "text", chunkSize = 7, stride = 7)
      .groupBy(col("doc_id"))
      .agg(sum(col("chunk_tokens")).as("n_tokens"),
        // chunks are disjoint and ordered by chunk_start: joining them
        // back with a space must reproduce the canonical text
        concat_ws(" ", array_sort(collect_list(
          struct(col("chunk_start"), col("chunk_text")))).getField("chunk_text"))
          .as("rejoined"))
    val orig = docs.select(col("doc_id"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
      Dedup.canonical(col("text")).as("canonical"))
    val joined = back.join(orig, "doc_id")
    assert(joined.filter(col("rejoined") =!= col("canonical")).count() === 0L)
    assert(joined.filter(back("n_tokens") =!= orig("n_tokens")).count() === 0L)
    // overlap: stride < size yields more chunk-tokens than the original
    val overlapped = Training.chunkTokens(docs, "doc_id", "text", chunkSize = 8, stride = 4)
      .agg(sum(col("chunk_tokens"))).head().getLong(0)
    val plain = orig.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(overlapped > plain)
  }

  test("contaminationPairs DF cap collapses a planted hot-shingle explosion") {
    // one boilerplate 3-gram shared by 40 docs (the crawl-footer shape) +
    // one genuinely contaminated test/train pair on cold shingles; split =
    // parity of the id (the cap behavior is independent of how the split
    // is derived)
    import org.apache.spark.sql.functions.when
    import spark.implicits._
    val hot = (0L until 40L).map(i => (i, s"all rights reserved unique$i words here"))
    val planted = Seq(
      (200L, "alpha beta gamma delta epsilon"), // even → test
      (301L, "alpha beta gamma delta zeta"))    // odd  → train
    val docs = (hot.toSeq ++ planted).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, "doc_id", "text", w = 3)
    val split = when(col("doc_id") % 2 === 0, "test").otherwise("train")
    // uncapped: the df=40 boilerplate shingle alone joins 20 test × 20
    // train = 400 pairs — quadratic in its DF, the 100 TB cliff
    val uncapped = Training.contaminationPairs(sh, "doc_id", split, minShared = 1L)
    assert(uncapped.count() >= 400L,
      "hot shingle should explode the uncapped test×train join")
    // capped at 10: boilerplate pruned, only the planted cold-shingle
    // contamination survives ("alpha beta gamma" + "beta gamma delta")
    val capped = Training.contaminationPairs(sh, "doc_id", split, minShared = 1L,
      maxShingleDf = Some(10L))
    val pairs = capped.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs === Map((200L, 301L) -> 2L),
      s"cap must prune the boilerplate pairs, keeping only the planted hit: $pairs")
  }

  test("stratifiedExact keeps exactly k per stratum (or the whole smaller stratum), deterministically") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val counts = Map("en" -> 7L, "zh" -> 3L)
    val got = Training.stratifiedExact(docs, "doc_id", "lang", counts, defaultCount = 2L)
    val byLang = got.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      val want = math.min(n, counts.getOrElse(lang, 2L))
      assert(byLang.getOrElse(lang, 0L) === want, s"stratum $lang: want $want")
    }
    // determinism: a second run over a REPARTITIONED input keeps the same ids
    val again = Training.stratifiedExact(docs.repartition(7), "doc_id", "lang",
      counts, defaultCount = 2L)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("contaminatedTrainDocs aggregates the drop list with blast-radius stats") {
    import org.apache.spark.sql.functions.when
    import spark.implicits._
    // two test docs leak into train doc 301 (overlaps 2 and 3); train doc
    // 303 is clean
    val docs = Seq(
      (200L, "alpha beta gamma delta epsilon"),
      (202L, "beta gamma delta zeta eta theta"),
      (301L, "alpha beta gamma delta zeta eta"),
      (303L, "completely different words entirely here")).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, "doc_id", "text", w = 3)
    val split = when(col("doc_id") < 300L, "test").otherwise("train")
    val got = Training.contaminatedTrainDocs(sh, "doc_id", split, minShared = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 200 vs 301 share {alpha beta gamma, beta gamma delta} = 2
    // 202 vs 301 share {beta gamma delta, gamma delta zeta, delta zeta eta} = 3
    assert(got === Map(301L -> ((2L, 3L))))
  }

  test("stratifiedKeepSql with empty rates emits a bare threshold, not an empty CASE") {
    val sql = Training.stratifiedKeepSql("doc_id", "lang", Map.empty, defaultRate = 0.25)
    assert(!sql.contains("CASE"), s"empty rates still emits a CASE: $sql")
    assert(sql.contains(Training.hexThreshold(0.25)))
  }

  test("bloomContaminatedTrainDocs equals the exact drop list (no false negatives survive)") {
    val docs = Tables.documents(spark, sf()).limit(200)
    val sh = Dedup.wordShingles(docs, "doc_id", "text", w = 3)
    val split = Training.splitColumn(col("doc_id"), fracs)
    val exact = Training.contaminatedTrainDocs(sh, "doc_id", split, minShared = 2L)
    val bloomed = Training.bloomContaminatedTrainDocs(sh, "doc_id", split, minShared = 2L)
    assert(exact.except(bloomed).isEmpty && bloomed.except(exact).isEmpty,
      "bloom prefilter changed the decontamination result")
    assert(exact.count() > 0L, "vacuous equivalence: no contamination found at all")
    // a deliberately undersized/high-fpp filter must STILL be exact — only
    // the prefilter selectivity degrades, never the answer
    val sloppy = Training.bloomContaminatedTrainDocs(sh, "doc_id", split, minShared = 2L,
      expectedTestShingles = 32L, fpp = 0.5)
    assert(exact.except(sloppy).isEmpty && sloppy.except(exact).isEmpty)
  }

  test("temperatureRates flattens the mixture: min stratum keeps all, shares move toward p^alpha") {
    val docs = Tables.documents(spark, sf("sf0.01")).select(col("doc_id"), col("lang"))
    val rates = Training.temperatureRates(docs, "lang", alpha = 0.5).cache()
    try {
      val r = rates.collect().map(x =>
        x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
      val nMin = r.values.map(_._1).min
      r.foreach { case (lang, (n, rate)) =>
        assert(rate === math.sqrt(nMin.toDouble / n), s"$lang rate formula")
        assert(rate > 0.0 && rate <= 1.0)
      }
      // the smallest stratum is never downsampled
      assert(r.values.filter(_._1 == nMin).forall(_._2 === 1.0))
      // achieved counts: close to rate·n, and the imbalance shrinks
      val sampled = Training.temperatureKeep(docs, "doc_id", "lang", rates)
        .groupBy(col("lang")).count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      r.foreach { case (lang, (n, rate)) =>
        val want = rate * n
        assert(math.abs(sampled(lang) - want) <= math.max(6.0, 0.25 * want),
          s"$lang: sampled ${sampled(lang)}, expected ≈ $want")
      }
      val natural = r.values.map(_._1)
      val flat = sampled.values
      assert(flat.max.toDouble / flat.min < natural.max.toDouble / natural.min,
        "temperature sampling must reduce the max/min stratum imbalance")
      // determinism: membership is a pure function of the id
      val again = Training.temperatureKeep(docs.repartition(9), "doc_id", "lang", rates)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val first = Training.temperatureKeep(docs, "doc_id", "lang", rates)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(first === again)
    } finally rates.unpersist()
  }

  test("repeatedSpans: misaligned shared passages detected; within-doc repeats excluded") {
    import spark.implicits._
    val passage = (0 until 60).map(i => s"p$i").mkString(" ")
    val block = (0 until 24).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $passage a4"),      // passage at token offset 4
      (2L, s"b1 $passage b5 b6"),          // same passage at token offset 2
      (3L, s"$block $block"),              // internal repeat only (n_docs = 1)
      (4L, "entirely unrelated words that appear exactly once each")
    ).toDF("doc_id", "text")
    // anchorMod = 1 keeps every window: the 60-token passage shared at
    // DIFFERENT alignments yields exactly 60 − 24 + 1 = 37 repeated fps,
    // each seen once per doc — a stride grid would have found none unless
    // the offsets agreed mod stride
    val all = Training.repeatedSpans(docs, "doc_id", "text", spanTokens = 24, anchorMod = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(all.size === 37, s"expected 37 shared windows, got ${all.size}")
    assert(all.values.forall(_ == ((2L, 2L, 1L))),
      "every shared window: 2 docs, 2 occurrences, first_doc = 1")
    // the content-anchored subset keeps identical per-fp stats
    val anchored = Training.repeatedSpans(docs, "doc_id", "text", spanTokens = 24, anchorMod = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(anchored.keySet.subsetOf(all.keySet))
    anchored.foreach { case (fp, stats) => assert(all(fp) === stats) }
    // the consumer: per-doc blast radius, closed form. doc 1 has 64 tokens
    // → 41 windows, 37 of them in the shared passage; doc 2 has 63 → 40
    // windows, 37 shared; doc 3's internal repeat is NOT cross-doc
    // (n_repeated 0); doc 4 is shorter than a window and absent.
    val stats = Training.repeatedSpanStats(docs, "doc_id", "text",
        spanTokens = 24, anchorMod = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats === Map(
      1L -> ((41L, 37L)),
      2L -> ((40L, 37L)),
      3L -> ((25L, 0L))))
  }

  test("contaminationPairs matches a brute-force shingle-set intersection") {
    val docs = Tables.documents(spark, sf()).limit(120)
    val sh = Dedup.wordShingles(docs, "doc_id", "text", w = 3)
    val split = Training.splitColumn(col("doc_id"), fracs)
    val got = Training.contaminationPairs(sh, "doc_id", split, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // driver-side brute force over the same shingle sets
    val labeled = sh.withColumn("split", split).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byDoc = labeled.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.head._3, rows.map(_._2).toSet)
    }
    val want = (for {
      (testId, ("test", testSh)) <- byDoc.toSeq
      (trainId, ("train", trainSh)) <- byDoc.toSeq
      shared = (testSh & trainSh).size.toLong
      if shared >= 2L
    } yield (testId, trainId) -> shared).toMap
    assert(got === want)
  }

  test("targetAffinity: exact masses and ratio on a hand-checked fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b", "tgt"),
      (2L, "b c", "other")
    ).toDF("doc_id", "text", "grp")
    // counts: a → (all 2, tgt 2); b → (all 2, tgt 1); c → (all 1, tgt 0)
    val got = Training.targetAffinity(docs, "doc_id", "text", col("grp") === "tgt")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got(1L) === ((3L, 5L, 6L, 5.0 / 6.0)))
    assert(got(2L) === ((2L, 1L, 3L, 1.0 / 3.0)))
  }

  test("targetAffinity: a doc of target-only vocabulary scores 1, disjoint scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y", "tgt"),   // vocabulary used ONLY by target docs
      (2L, "p q p", "other")  // vocabulary the target never uses
    ).toDF("doc_id", "text", "grp")
    val got = Training.targetAffinity(docs, "doc_id", "text", col("grp") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got === Map(1L -> 1.0, 2L -> 0.0))
  }

  test("sourceQuota: clips every source to the cap; membership is rerun-stable") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), col("source"))
    val capped = Training.sourceQuota(docs, "doc_id", "source", cap = 15)
    val perSource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ === 15L),
      s"every source holds 25 docs at sf0.01, so each must clip to exactly 15: $perSource")
    val ids = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Training.sourceQuota(docs.repartition(11), "doc_id", "source", cap = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === again, "quota membership must be a pure function of the id set")
  }

  test("globalSample: exact size, nested across sizes, rerun-stable") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    def ids(n: Int) = Training.globalSample(docs, "doc_id", n)
      .collect().map(_.getLong(0)).toSet
    val s50 = ids(50)
    val s100 = ids(100)
    assert(s50.size === 50 && s100.size === 100)
    assert(s50.subsetOf(s100), "the 50-sample must be contained in the 100-sample")
    assert(ids(50) === s50, "rerun changed the sample")
  }

  test("shard routing: full range, manifest totals add up, reshuffle-stable") {
    val n = 16
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("n_chars"))
    val routed = docs.select(col("doc_id"),
      Training.shardColumn(col("doc_id"), n).as("shard"))
    val shards = routed.select("shard").distinct().collect().map(_.getLong(0)).toSet
    assert(shards.forall(s => s >= 0 && s < n))
    val manifest = Training.shardManifest(docs, "doc_id", "n_chars", n).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(manifest.map(_._2._1).sum === docs.count(), "manifest doc counts must cover the corpus")
    manifest.values.foreach { case (_, _, first, last) => assert(first <= last) }
    // pure function of ids: identical manifest from any partitioning
    val again = Training.shardManifest(docs.repartition(9), "doc_id", "n_chars", n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(manifest === again)
  }

  test("mixtureEpochs: repeat factors hit the budget; over-cap flags the data-constrained source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a", 100L), (1L, "a", 100L), // source a: 200 tokens
      (2L, "b", 50L),                   // source b: 50 tokens
      (3L, "c", 99L)                    // not in the mixture: excluded
    ).toDF("doc_id", "source", "n_tokens")
    val out = Training.mixtureEpochs(docs, "source", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5), budgetFactor = 1.0, maxEpochs = 2.0)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    // mixture mass = 250 (c excluded), budget = 250
    assert(out.keySet === Set("a", "b"))
    assert(out("a") === ((200L, 125.0, 0.625, false)))
    assert(out("b") === ((50L, 125.0, 2.5, true)), "b must repeat 2.5 epochs and trip the cap")
  }

  test("noveltyScore: first-occurrence fractions, dup scores zero, short docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // shingles {a b c, b c d}, both first here → 1.0
      (2L, "a b c x"), // {a b c (first in 1), b c x} → 0.5
      (3L, "a b"),     // < 3 tokens → absent
      (4L, "a b c d")  // exact dup of 1 → both shingles seen → 0.0
    ).toDF("doc_id", "text")
    val got = Training.noveltyScore(docs, "doc_id", "text", w = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      4L -> ((2L, 0L, 0.0))))
  }

  test("noveltyScoreIncremental: equals full recompute restricted to the batch, any id interleaving") {
    import spark.implicits._
    // batch ids deliberately INTERLEAVE history ids: doc 2 (batch) precedes
    // doc 5 (history), so corpus-first = min(stored, batch) is exercised in
    // both directions
    val hist = Seq((1L, "a b c d"), (5L, "p q r s")).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "a b c x"),  // "a b c" stored (first 1); "b c x" novel here
      (3L, "p q r s"),  // all stored under id 5? NO — 3 < 5, but index says 5:
                        // corpus-first is min(5, 3-batch-min)... batch min is 3
      (9L, "p q r s")   // loses both to doc 3 within the batch
    ).toDF("doc_id", "text")
    val idx = Training.noveltyFirstIndex(hist, "doc_id", "text", w = 3)
    val inc = Training.noveltyScoreIncremental(batch, "doc_id", "text", idx, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = Training.noveltyScore(hist.unionByName(batch), "doc_id", "text", w = 3)
      .filter($"doc_id".isin(2L, 3L, 9L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(inc === full)
    // the interleave case concretely: doc 3's shingles first-occur at id 3
    // corpus-wide (3 < 5), so it scores 1.0 despite the index hit
    assert(inc.contains((3L, 2L, 2L, 1.0)))
    assert(inc.contains((9L, 2L, 0L, 0.0)))
  }

  test("packingStats: closed-form fill rates and over-budget bins") {
    import spark.implicits._
    val packed = Seq(
      ("a", 0L, 10L), ("a", 0L, 90L), // bin a/0: 100 tokens, exactly at budget
      ("a", 1L, 120L),                // bin a/1: overshoot (large item)
      ("b", 0L, 50L)
    ).toDF("shard", "bin", "n_tokens")
    val got = Training.packingStats(packed, "n_tokens", budget = 100L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got === Map(
      "a" -> ((2L, 3L, 220L, 120L, 1L, 1.1)),
      "b" -> ((1L, 1L, 50L, 50L, 0L, 0.5))))
  }

  test("topFractionPerGroup: exact ceil counts per group, one shared exchange") {
    import spark.implicits._
    val docs = ((1L to 10L).map(i => (i, "a", i.toDouble)) :+ (100L, "b", 0.5))
      .toDF("id", "grp", "score")
    val kept = Training.topFractionPerGroup(docs, "id", "grp", "score", frac = 0.3)
    val got = kept.collect().map(_.getLong(0)).toSet
    // group a: ceil(0.3*10)=3 highest scores; group b: ceil(0.3*1)=1 — a
    // non-empty group always survives
    assert(got === Set(8L, 9L, 10L, 100L))
    // tie-break: equal scores rank by id (smallest first)
    val ties = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0)).toDF("id", "grp", "score")
    val keptTies = Training.topFractionPerGroup(ties, "id", "grp", "score", frac = 0.33)
      .collect().map(_.getLong(0)).toSet
    assert(keptTies === Set(1L))
    // both windows ride ONE group-keyed exchange (AQE prints the initial
    // plan after the final one — count only the final, the q145 rule)
    kept.collect()
    val plan = kept.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning(grp"))
    assert(exchanges === 1, s"rank and count windows must share the exchange:\n$plan")
  }

  test("truncateTokens clips at the budget, flags, and keeps short docs canonical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "short  doc"), // internal run canonicalizes
      (3L, "exact four token doc")).toDF("doc_id", "text")
    val got = Training.truncateTokens(docs, "text", maxTokens = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(1L) === (("one two three four", 6L, true)))
    assert(got(2L) === (("short doc", 2L, false)))
    assert(got(3L) === (("exact four token doc", 4L, false)))
  }

  test("weightedSample: weight-proportional, deterministic, TakeOrdered-shaped") {
    import spark.implicits._
    // one dominant weight among noise: ln(u)/w for w=10^9 is ~0 (the
    // maximum key region) for ANY u, so the heavy row must be drawn
    val rows = ((1L to 50L).map(i => (i, 1.0)) :+ (99L, 1e9)).toDF("id", "w")
    val one = Training.weightedSample(rows, "id", "w", n = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(one === Seq(99L), s"dominant weight must win the single draw: $one")
    // deterministic: same frame, same seed, same sample — twice
    val a = Training.weightedSample(rows, "id", "w", n = 10).collect().map(_.getLong(0)).toSet
    val b = Training.weightedSample(rows, "id", "w", n = 10).collect().map(_.getLong(0)).toSet
    assert(a === b && a.size === 10 && a.contains(99L))
    // a different seed draws a different (but still deterministic) set
    val c = Training.weightedSample(rows, "id", "w", n = 10, seed = "other")
      .collect().map(_.getLong(0)).toSet
    assert(c !== a)
    // zero/negative/null weights are un-sampleable
    val withBad = rows.union(Seq((200L, 0.0), (201L, -5.0)).toDF("id", "w"))
    val full = Training.weightedSample(withBad, "id", "w", n = 100)
      .collect().map(_.getLong(0)).toSet
    assert(!full.contains(200L) && !full.contains(201L) && full.size === 51)
    // top-n plans as TakeOrderedAndProject, not a global sort
    val plan = Training.weightedSample(rows, "id", "w", n = 5)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-n degraded to a sort:\n$plan")
  }
}
