package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("streaming tumbling window aggregates by hour with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.tumblingHourly(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(30), "click", 2.0), (ts(70), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select(date_format($"hour_start", "HH:mm").as("h"), $"event_type", $"n_events")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(("00:00", "click", 2L), ("01:00", "view", 1L)))
    } finally q.stop()
  }

  test("file-source stream over a parquet dir matches the batch aggregate") {
    import graft.Tables
    val tmp = java.nio.file.Files.createTempDirectory("evstream").toString
    // write the sf0.001 events (µs-converted) as the "arriving" files
    Tables.events(spark, sf()).coalesce(2).write.mode("overwrite").parquet(tmp)
    val stream = EventStream.fromParquetDir(spark, tmp, maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = EventStream.tumblingHourly(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val batch = graft.ops.Events.tumblingHourly(Tables.events(spark, sf()))
      // update-mode rows per micro-batch accumulate; latest per key wins —
      // compare total event mass instead of per-row equality
      val streamedTotal = spark.table("file_hourly")
        .groupBy("hour_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
        .agg(sum("n_events")).head().getLong(0)
      val batchTotal = batch.agg(sum("n_events")).head().getLong(0)
      assert(streamedTotal === batchTotal)
    } finally q.stop()
  }

  test("foreachBatch upsert sink keeps a managed serving table current") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.tumblingHourly(events)
      .withColumn("k", concat_ws("|", $"hour_start".cast("string"), $"event_type"))
    val q = EventStream.toStoreUpsert(agg, "serving_hourly", "k")
    try {
      input.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0))
      q.processAllAvailable()
      val after1 = graft.sources.Store.read(spark, "serving_hourly")
        .filter($"event_type" === "click").head()
      assert(after1.getAs[Long]("n_events") === 2L)
      // late-but-within-watermark update to the same window: upsert replaces
      input.addData((ts(20), "click", 4.0), (ts(70), "view", 1.0))
      q.processAllAvailable()
      val rows = graft.sources.Store.read(spark, "serving_hourly")
        .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events")).toMap
      assert(rows === Map("click" -> 3L, "view" -> 1L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS serving_hourly")
    }
  }

  test("checkpointed upsert pipeline resumes after restart without reprocessing") {
    import graft.Tables
    val srcDir = java.nio.file.Files.createTempDirectory("ckptsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val all = Tables.events(spark, sf())
    // split by TIME, not row index: phase-2 arrivals must sit at or above
    // the phase-1 watermark (max ts − 2 h), or the restarted stream would
    // legitimately drop them as late while the batch twin counts them
    val n = all.count()
    val cut = all.select($"ts").orderBy($"ts").limit((n / 2).toInt)
      .agg(max($"ts")).head().getTimestamp(0)
    val phase1 = all.filter($"ts" <= cut)
    val phase2 = all.filter($"ts" > cut)
    // phase 1: only the older half of the data exists; run to completion
    phase1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    def startQuery() = {
      val stream = EventStream.fromParquetDir(spark, srcDir, maxFilesPerTrigger = 1)
      val agg = EventStream.tumblingHourly(stream)
        .withColumn("k", concat_ws("|", $"hour_start".cast("string"), $"event_type"))
      EventStream.toStoreUpsert(agg, "ckpt_serving", "k",
        checkpointLocation = Some(ckpt))
    }
    try {
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      // phase 2: "restart" — new files arrive while the query is down
      phase2.coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        // the restarted query must have consumed ONLY the new file(s):
        // committed offsets live in the checkpoint, so the phase-1 file is
        // not reprocessed (its rows would double the counts — caught below
        // anyway — but pin the input volume explicitly too)
        val reprocessed = q2.recentProgress.map(_.numInputRows).sum
        assert(reprocessed === phase2.count(),
          s"restart reprocessed committed batches: $reprocessed input rows")
      } finally q2.stop()
      // final serving table == batch answer over the full dataset
      val batch = graft.ops.Events.tumblingHourly(
        spark.read.schema(EventStream.eventSchema).parquet(srcDir))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val served = graft.sources.Store.read(spark, "ckpt_serving")
        .select(date_format($"hour_start", "yyyy-MM-dd HH:mm:ss"), $"event_type", $"n_events")
        .collect()
        .groupBy(_.getString(0)).map { case (h, rs) => h -> rs.map(_.getLong(2)).sum }
      assert(served === batch)
    } finally spark.sql("DROP TABLE IF EXISTS ckpt_serving")
  }

  test("streaming dedup drops re-deliveries of the same key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "event_id", "value")
    val q = EventStream.dedupWithinWatermark(events, "ts", "2 hours", Seq("event_id"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData((ts(5), 1L, 1.0), (ts(6), 1L, 1.0), (ts(7), 2L, 3.0))
      q.processAllAvailable()
      // same event_id re-delivered in a LATER micro-batch, still in horizon
      input.addData((ts(8), 1L, 9.0), (ts(9), 3L, 5.0))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 2L, 3L), "each key exactly once")
    } finally q.stop()
  }

  test("stream-stream range join matches across micro-batches, inclusively, via bucket keys") {
    implicit val sqlCtx = spark.sqlContext
    val points = MemoryStream[(Long, Timestamp)]
    val intervals = MemoryStream[(Long, Timestamp)]
    // base the fixture a day into the epoch: event times at/near epoch 0
    // sit exactly on the initial watermark boundary, an edge irrelevant to
    // the operator under test
    def t(min: Long) = ts(1440 + min)
    val joined = EventStream.rangeJoinStream(
      points.toDF().toDF("point_id", "ts"),
      intervals.toDF().toDF("interval_id", "w_start"),
      "ts", "w_start", intervalSeconds = 600L, bucketSeconds = 600L)
    val q = joined.select("point_id", "interval_id")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // batch 1: interval A [0, 10m]; a point inside (5m), one exactly on
      // the inclusive end (10m), one outside (11m)
      intervals.addData((100L, t(0)))
      points.addData((1L, t(5)), (2L, t(10)), (3L, t(11)))
      q.processAllAvailable()
      // batch 2: the MATCHING SIDE arrives later — interval B [8m, 18m]
      // must pair with the already-buffered points 2 (10m) and 3 (11m):
      // state from batch 1 participates (the whole point of a
      // stream-stream join), including across a bucket boundary
      intervals.addData((200L, t(8)))
      q.processAllAvailable()
      val got = spark.table("ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
    } finally q.stop()
  }

  test("mapGroupsWithState carries custom session state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val events = input.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.sessionStatsCustomState(events, gapSeconds = 1800L).toDF()
      .writeStream.format("memory").queryName("custom_state")
      .outputMode("update").start()
    try {
      // batch 1 (out of order WITHIN the batch — the fold must sort):
      // user 7 events at 40min and 0min → one session (gap 40min > 30? yes
      // — 40min gap splits!) → sessions: [0], [40] = 2 sessions
      input.addData((2L, ts(40), 7L), (1L, ts(0), 7L))
      q.processAllAvailable()
      // batch 2: state must CONTINUE — event at 50min is within 30min of
      // the stored lastTs (40min) → same session; event at 120min → new
      val _ = spark.table("custom_state").collect()
      input.addData((3L, ts(50), 7L), (4L, ts(120), 7L))
      q.processAllAvailable()
      val last = spark.table("custom_state")
        .filter($"user_id" === 7L)
        .orderBy($"n_events".desc).head()
      assert(last.getAs[Long]("n_events") === 4L)
      assert(last.getAs[Long]("n_sessions") === 3L,
        "sessions [0], [40,50], [120] — state must survive the batch boundary")
    } finally q.stop()
  }

  test("streaming session window closes after the 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    // session-window aggregation emits only CLOSED sessions (append mode):
    // a session is final once the watermark passes its end + gap
    val q = EventStream.sessionized(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0 and 10 (one session), then 120 (new session)
      input.addData((ts(0), 1L, 1.0), (ts(10), 1L, 1.0), (ts(120), 1L, 1.0))
      q.processAllAvailable()
      // advance the watermark far past both sessions so they close
      input.addData((ts(600), 99L, 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter($"user_id" === 1L).collect()
      assert(sessions.length === 2, s"expected 2 sessions, got ${sessions.toSeq}")
      assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming exact-dedup restarts from its checkpoint and keeps ingestion-order keepers") {
    import graft.sources.Store
    val srcDir = java.nio.file.Files.createTempDirectory("xdsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("xdckpt").toString
    val labelsOut = java.nio.file.Files.createTempDirectory("xdout").toString + "/labels"
    val table = "xd_fp_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val phase1 = Seq((10L, "x"), (11L, "y"), (12L, "x")).toDF("doc_id", "text")
    val phase2 = Seq((1L, "x"), (13L, "z"), (14L, "Y")).toDF("doc_id", "text")
    phase1.coalesce(1).write.mode("append").parquet(srcDir)
    def start() = EventStream.exactDedupIncremental(
      spark.readStream.schema(phase1.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", table, labelsOut, checkpointLocation = Some(ckpt))
    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // new file lands while the query is down; the restart must consume
      // ONLY it (committed offsets live in the checkpoint)
      phase2.coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(q2.recentProgress.map(_.numInputRows).sum === 3L,
          "restart reprocessed committed batches")
      } finally q2.stop()
      val labels = spark.read.parquet(labelsOut).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("dup_of"), r.getAs[Boolean]("keep")))).toMap
      assert(labels === Map(
        10L -> ((10L, true)), 11L -> ((11L, true)), 12L -> ((10L, false)),
        // "x" was indexed in phase 1: the stored keeper wins despite 1 < 10
        1L -> ((10L, false)),
        13L -> ((13L, true)),
        // case-canonical dup of the phase-1 "y"
        14L -> ((11L, false))))
      val keepers = Store.read(spark, table).collect()
        .map(_.getAs[Long]("keeper")).toSet
      assert(keepers === Set(10L, 11L, 13L),
        "index must hold exactly the first-arrival keepers")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming span dedup: stored digests win by ARRIVAL; batch-local first by (id, pos)") {
    import graft.sources.Store
    val srcDir = java.nio.file.Files.createTempDirectory("spsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("spckpt").toString
    val cleanOut = java.nio.file.Files.createTempDirectory("spout").toString + "/clean"
    val table = "sp_digest_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val phase1 = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    // doc 1 copies the INDEXED span (smaller id must NOT steal it back);
    // docs 1 and 2 race on a new span within the batch — (id, pos) min wins
    val phase2 = Seq((1L, "a b c d e x y z w v"), (2L, "x y z w v")).toDF("doc_id", "text")
    phase1.coalesce(1).write.mode("append").parquet(srcDir)
    def start() = EventStream.spanDedupIncremental(
      spark.readStream.schema(phase1.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", table, cleanOut, w = 5, checkpointLocation = Some(ckpt))
    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      phase2.coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(cleanOut).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"))))
        .toMap
      assert(got === Map(
        10L -> (("a b c d e", 1L, 1L)),
        1L -> (("x y z w v", 2L, 1L)),
        2L -> (("", 1L, 0L))))
      // the index holds each digest's FIRST-arrival owner
      val idx = Store.read(spark, table).collect()
        .map(r => (r.getAs[Long]("first_id"), r.getAs[Int]("first_ck"))).toSet
      assert(idx === Set((10L, 0), (1L, 1)))
      // REPLAY guard: re-deliver phase 2 against the ALREADY-ADVANCED
      // index (a fresh checkpoint replays the committed batch — the
      // at-least-once window after the index upsert). The owner-matching
      // arm must reproduce the original output instead of reading every
      // chunk as a duplicate and emitting empty documents.
      val ckpt2 = java.nio.file.Files.createTempDirectory("spckpt2").toString
      val replayOut = java.nio.file.Files.createTempDirectory("spout2").toString + "/clean"
      val srcDir2 = java.nio.file.Files.createTempDirectory("spsrc2").toString
      phase2.coalesce(1).write.mode("append").parquet(srcDir2)
      val q3 = EventStream.spanDedupIncremental(
        spark.readStream.schema(phase1.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir2),
        "doc_id", "text", table, replayOut, w = 5, checkpointLocation = Some(ckpt2))
      try q3.processAllAvailable() finally q3.stop()
      val replayed = spark.read.parquet(replayOut).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept")))).toMap
      assert(replayed === Map(
        1L -> (("x y z w v", 1L)), 2L -> (("", 0L))),
        s"replayed batch must reproduce its output, not empty it: $replayed")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming heavy hitters: counts survive restart; a replayed batch is idempotent") {
    import graft.sources.Store
    val srcDir = java.nio.file.Files.createTempDirectory("hhsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hhckpt").toString
    val table = "hh_counts_t"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val phase1 = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val phase2 = Seq((3L, "a a d")).toDF("doc_id", "text")
    phase1.coalesce(1).write.mode("append").parquet(srcDir)
    def start() = EventStream.heavyHittersIncremental(
      spark.readStream.schema(phase1.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "text", table, checkpointLocation = Some(ckpt))
    try {
      val (q1, _) = start()
      try q1.processAllAvailable() finally q1.stop()
      phase2.coalesce(1).write.mode("append").parquet(srcDir)
      val (q2, cmsOf) = start()
      try q2.processAllAvailable() finally q2.stop()
      def totals: Map[String, Long] = Store.read(spark, table)
        .groupBy(col("tok")).agg(sum(col("n")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 1L)
      assert(totals === expected)
      // a REPLAYED batch overwrites its own `batch|token` rows instead of
      // double-adding: re-apply the restarted run's batch (phase 2 = batch
      // 1) with the keys the sink would regenerate
      val replay = Seq(("a", 2L, "1|a"), ("d", 1L, "1|d")).toDF("tok", "n", "bkey")
      Store.upsert(spark, table, replay, "bkey", buckets = 4)
      assert(totals === expected, "replayed batch double-added counts")
      // the restarted run's sketch covers ITS batches (per-run, as
      // documented) and must never under-estimate what it saw
      val bytes = graft.functions.CmsExprs.serialize(cmsOf().get)
      val est = Seq("a", "d").toDF("tok")
        .withColumn("e", graft.functions.CmsExprs.cms_estimate(col("tok"), bytes))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("a") >= 2L && est("d") >= 1L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming novelty restarts from its checkpoint; stored shingles win by ARRIVAL, not id") {
    import graft.sources.Store
    val srcDir = java.nio.file.Files.createTempDirectory("nvsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("nvckpt").toString
    val scoresOut = java.nio.file.Files.createTempDirectory("nvout").toString + "/scores"
    val table = "nv_first_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val phase1 = Seq((10L, "a b c d"), (12L, "a b c d")).toDF("doc_id", "text")
    // doc 1 arrives LATER with a smaller id: its "a b c" must NOT be novel
    // (the stored first-arrival wins), unlike q126's corpus-min route
    val phase2 = Seq((1L, "a b c x"), (13L, "p q r")).toDF("doc_id", "text")
    phase1.coalesce(1).write.mode("append").parquet(srcDir)
    def start() = EventStream.noveltyIncremental(
      spark.readStream.schema(phase1.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", table, scoresOut, checkpointLocation = Some(ckpt))
    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      phase2.coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(q2.recentProgress.map(_.numInputRows).sum === 2L,
          "restart reprocessed committed batches")
      } finally q2.stop()
      val scores = spark.read.parquet(scoresOut).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
            r.getAs[Double]("novelty")))).toMap
      assert(scores === Map(
        10L -> ((2L, 2L, 1.0)),  // batch-local min claims both shingles
        12L -> ((2L, 0L, 0.0)),  // same-batch dup
        1L -> ((2L, 1L, 0.5)),   // "a b c" stored → not novel; "b c x" novel
        13L -> ((1L, 1L, 1.0)))) // 3 tokens → exactly one shingle
      val firsts = Store.read(spark, table).collect()
        .map(r => r.getAs[String]("shingle") -> r.getAs[Long]("first_id")).toMap
      assert(firsts === Map(
        "a b c" -> 10L, "b c d" -> 10L, "b c x" -> 1L, "p q r" -> 13L),
        "index must hold first-ARRIVAL ids; a stored entry is never rewritten")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming near-dup pair set is invariant to the batch split and equals the batch pipeline") {
    import graft.ops.Dedup
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base), (2L, base),                      // dup pair within one batch
      (3L, "alpha beta gamma delta words epsilon zeta"),
      (4L, base),                                  // dup of 1/2 in a LATER batch
      (5L, "unrelated totally different content entirely"),
      (6L, "alpha beta gamma delta words epsilon zeta") // dup of 3 across batches
    ).toDF("doc_id", "text")
    val batchPairs = Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignaturesScanLocal(docs, "doc_id", "text", k = 4, w = 3),
          "doc_id", k = 4, r = 2), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty)
    for (nFiles <- Seq(1, 3)) {
      val srcDir = java.nio.file.Files.createTempDirectory(s"nd$nFiles").toString
      docs.repartition(nFiles, col("doc_id")).write.mode("overwrite").parquet(srcDir)
      val outRoot = java.nio.file.Files.createTempDirectory(s"ndp$nFiles").toString
      val pairsOut = s"$outRoot/pairs"
      val indexPath = s"$outRoot/bandidx"
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStream.nearDupIncremental(
        stream, "doc_id", "text", indexPath, pairsOut, k = 4, w = 3, r = 2)
      try q.processAllAvailable()
      finally q.stop()
      val got = spark.read.parquet(pairsOut).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batchPairs, s"split into $nFiles files changed the pair set")
    }
  }

  test("near-dup sink folds its band index mid-stream without changing the pair set") {
    import graft.ops.Dedup
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "alpha beta gamma delta words epsilon zeta"),
      (4L, base),
      (5L, "unrelated totally different content entirely"),
      (6L, "alpha beta gamma delta words epsilon zeta")
    ).toDF("doc_id", "text")
    val batchPairs = Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignaturesScanLocal(docs, "doc_id", "text", k = 4, w = 3),
          "doc_id", k = 4, r = 2), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val srcDir = java.nio.file.Files.createTempDirectory("ndc").toString
    docs.repartition(3, col("doc_id")).write.mode("overwrite").parquet(srcDir)
    val outRoot = java.nio.file.Files.createTempDirectory("ndcp").toString
    val indexPath = s"$outRoot/bandidx"
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    // compactIndexEvery = 1: the fold runs after EVERY applied batch, so
    // later triggers probe an index that has been rewritten under them
    val q = EventStream.nearDupIncremental(
      stream, "doc_id", "text", indexPath, s"$outRoot/pairs", k = 4, w = 3, r = 2,
      compactIndexEvery = 1)
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.read.parquet(s"$outRoot/pairs").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === batchPairs, "mid-stream index folds changed the pair set")
    // the final fold ran after the last batch: every dir is compact
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) files += f.getPath
    }
    val crowded = files.groupBy(_.getParent).filter(_._2.size > 1)
    assert(crowded.isEmpty, s"dirs still crowded after per-batch folds: ${crowded.keys}")
  }

  test("index-sync sink bootstraps a missing index from a PRE-EXISTING corpus table") {
    import graft.ops.{Dedup, IndexSync}
    import graft.sources.Store
    // the corpus table already exists (an earlier pipeline built it) and
    // NO index table does — the wedge case code-review r13 #1 flagged:
    // bootstrap must be per index table, from the table's current state
    val pre = Seq(
      (1L, "alpha beta gamma delta words"),
      (2L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    Seq("sync_docs_t", "sync_fp_t").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Store.bulkWrite(pre, "sync_docs_t", "doc_id", buckets = 2, parts = 2,
      validateKeys = true)
    val incoming = Seq(
      (2L, "the quick brown fox jumps high updated"), // update of a pre-existing key
      (3L, "entirely new arriving document body")).toDF("doc_id", "text")
    val srcDir = java.nio.file.Files.createTempDirectory("isync").toString
    incoming.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = EventStream.toStoreUpsertWithIndexSync(
      stream, "sync_docs_t", "doc_id", "text",
      exactIndexTable = Some("sync_fp_t"), buckets = 2, parts = 2)
    try q.processAllAvailable()
    finally q.stop()
    try {
      // the index bootstrapped from the post-upsert table state: all three
      // docs, with doc 2's UPDATED fingerprint
      val idx = Store.read(spark, "sync_fp_t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = Store.read(spark, "sync_docs_t")
        .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(idx === expect)
      assert(idx.keySet === Set(1L, 2L, 3L))
      // and a SECOND stream run over a further update takes the changelog
      // path against the bootstrapped index
      val more = Seq((1L, "alpha beta gamma delta words changed")).toDF("doc_id", "text")
      val srcDir2 = java.nio.file.Files.createTempDirectory("isync2").toString
      more.coalesce(1).write.mode("overwrite").parquet(srcDir2)
      val stream2 = spark.readStream.schema(more.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir2)
      val q2 = EventStream.toStoreUpsertWithIndexSync(
        stream2, "sync_docs_t", "doc_id", "text",
        exactIndexTable = Some("sync_fp_t"), buckets = 2, parts = 2)
      try q2.processAllAvailable()
      finally q2.stop()
      val keeper = IndexSync.exactKeeperView(spark, "sync_fp_t", "doc_id")
      assert(keeper.count() === 3L)
      val idx2 = Store.read(spark, "sync_fp_t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect2 = Store.read(spark, "sync_docs_t")
        .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(idx2 === expect2)
    } finally Seq("sync_docs_t", "sync_fp_t")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("index-sync sink recovers a crash between corpus commit and index apply") {
    import graft.ops.Dedup
    import graft.sources.Store
    def runSink(rows: Seq[(Long, String)], tag: String): Unit = {
      val df = rows.toDF("doc_id", "text")
      val srcDir = java.nio.file.Files.createTempDirectory(s"crash$tag").toString
      df.coalesce(1).write.mode("overwrite").parquet(srcDir)
      val stream = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStream.toStoreUpsertWithIndexSync(
        stream, "cr_docs", "doc_id", "text",
        exactIndexTable = Some("cr_fp"), buckets = 2, parts = 2)
      try q.processAllAvailable()
      finally q.stop()
    }
    Seq("cr_docs", "cr_fp").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      runSink(Seq((1L, "alpha beta gamma")), "a")
      // CRASHED batch B: its corpus commit landed, its index apply did not
      // (the second-pass review hole: a naive replay re-upserts identical
      // values, diffs value-empty, and silently skips B's index update
      // forever). The sink must detect the index's recorded version is
      // behind/vacuumed and converge.
      Store.upsert(spark, "cr_docs",
        Seq((2L, "bravo charlie delta")).toDF("doc_id", "text"), "doc_id",
        buckets = 2)
      // at-least-once replay of B through the sink
      runSink(Seq((2L, "bravo charlie delta")), "b")
      val idx = Store.read(spark, "cr_fp")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = Store.read(spark, "cr_docs")
        .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(idx === expect)
      assert(idx.keySet === Set(1L, 2L))
    } finally Seq("cr_docs", "cr_fp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("funnelCustomState equals the batch funnel for any time-ordered batch split") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("signup", "view", "click", "purchase")
    // shifted off the epoch origin: a ts equal to the INITIAL watermark (0)
    // is dropped as late before the stateful operator ever sees it
    def t(min: Long) = ts(1440 + min)
    val data = Seq(
      // full funnel in order
      (1L, t(0), "signup", 1L), (1L, t(10), "view", 2L),
      (1L, t(20), "click", 3L), (1L, t(30), "purchase", 4L),
      // skips 'view' → stuck at depth 1 (click needs view first)
      (2L, t(5), "signup", 5L), (2L, t(6), "click", 6L),
      // view BEFORE signup doesn't count; signup alone → depth 1
      (3L, t(1), "view", 7L), (3L, t(40), "signup", 8L),
      // only non-stage events → depth 0 still emitted
      (4L, t(2), "error", 9L),
      // same-timestamp stage event does NOT qualify (strictly-after rule)
      (5L, t(8), "signup", 10L), (5L, t(8), "view", 11L), (5L, t(9), "view", 12L))
    val batch = graft.ops.Events.funnel(
        data.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val splits = Seq(
      "one" -> Seq(data),
      "three" -> data.sortBy(r => (r._2.getTime, r._4)).grouped(4).toSeq)
    for ((label, chunks) <- splits) {
      val input = MemoryStream[(Long, Timestamp, String, Long)]
      val df = input.toDF().toDF("user_id", "ts", "event_type", "event_id")
      val sink = s"funnel_split_$label"
      val q = EventStream.funnelCustomState(df, stages).toDF()
        .writeStream.format("memory").queryName(sink).outputMode("update").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        val got = spark.table(sink)
          .groupBy($"user_id").agg(max($"depth").as("depth"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got === batch, s"split '$label' diverged from the batch funnel")
      } finally q.stop()
    }
  }

  test("cohortRetentionCustomState credits each (user, k) once and matches the batch cohorts") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = ts(1440 + min)
    val data = Seq(
      // user 1: cohort hour 0 (of the shifted day), active at k=0,1,3;
      // the k=1 hour has TWO events — still one credit
      (1L, t(5), 1L), (1L, t(70), 2L), (1L, t(75), 3L), (1L, t(190), 4L),
      // user 2: single event → k=0 only
      (2L, t(62), 5L),
      // user 3: active past maxOffset → the k=8 hour earns nothing
      (3L, t(10), 6L), (3L, t(8 * 60 + 30), 7L))
    val batch = graft.ops.Events.cohortRetention(
        data.toDF("user_id", "ts", "event_id").withColumn("event_type", lit("x")),
        "user_id", "ts", maxOffset = 6)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((label, chunks) <- Seq(
        "one" -> Seq(data),
        "three" -> data.sortBy(r => (r._2.getTime, r._3)).grouped(3).toSeq)) {
      val input = MemoryStream[(Long, Timestamp, Long)]
      val df = input.toDF().toDF("user_id", "ts", "event_id")
      val sink = s"cohort_split_$label"
      val q = EventStream.cohortRetentionCustomState(df, maxOffset = 6).toDF()
        .writeStream.format("memory").queryName(sink).outputMode("update").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        val got = spark.table(sink).distinct()
          .groupBy($"cohort_hour_us", $"k")
          .agg(countDistinct($"user_id").as("n_active"))
          .collect()
          .map(r => (new Timestamp(r.getLong(0) / 1000L), r.getInt(1)) -> r.getLong(2))
          .toMap
        assert(got === batch, s"split '$label' diverged from the batch cohorts")
      } finally q.stop()
    }
  }

  test("index-sync sink keeps a stored IVF index changelog-synced across batches and compaction") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Similarity
    import graft.sources.Store
    val table = "ivf_stream_docs"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = java.nio.file.Files.createTempDirectory("ivfstream").toString + "/idx"
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    // compactEvery = 2: the maintenance fold runs BETWEEN sync batches, so
    // batch 3 only takes the O(batch) sync path if the compaction block
    // advanced the IVF `_corpus-v` marker alongside the table-property
    // marks (ADVICE r15) — without it, the recorded version is vacuumed
    // and batch 3 silently falls back to a full rebuild that also
    // retrains the codebook (observable below as a rotated generation).
    val q = graft.streaming.EventStream.toStoreUpsertWithIndexSync(
      stream, table, "vec_id", "text", buckets = 2, parts = 2,
      ivfIndexPath = Some(path), nCentroids = 2, compactEvery = 2)
    try {
      // batch 1: fresh corpus → bulk write + from-scratch index build
      input.addData(
        (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f, 0f)),
        (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0.1f, 0.9f, 0f)))
      q.processAllAvailable()
      // batch 2: insert → changelog sync; then the compactEvery fold runs
      input.addData((10L, Seq(0.95f, 0.05f, 0f, 0f)))
      q.processAllAvailable()
      // batch 3: cross-batch UPDATE across the compaction commit
      input.addData((3L, Seq(0.85f, 0.15f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    try {
      // the codebook stayed frozen: one generation, never rotated
      val gens = new java.io.File(path).listFiles()
        .map(_.getName).filter(_.startsWith("gen-")).toSet
      assert(gens === Set("gen-0"),
        s"stream fell back to a rebuild (generations: $gens)")
      // the index records exactly the table's current version
      assert(Similarity.ivfSyncedCorpusVersion(spark, path) ===
        Some(Store.versions(spark, table).last))
      // and answers EXACTLY as a from-scratch build over the final state
      // (all cells probed → both routes are exact over their vector sets)
      val fin = Store.read(spark, table).select($"vec_id", $"embedding")
      val probes = Seq((100L, Seq(1f, 0.02f, 0f, 0f)), (101L, Seq(0f, 0f, 1f, 0.02f)))
        .toDF("vec_id", "embedding")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select($"q_id", $"rank", $"neighbor_id", round($"cosine", 9).as("c"))
          .collect().map(_.toSeq.toVector).toSet
      val synced = key(Similarity.ivfQuerySynced(spark, path, probes,
        "vec_id", "embedding", k = 5, nProbe = 2))
      val rebuilt = key(Similarity.ivfQuery(probes,
        Similarity.buildIvfIndex(fin, "vec_id", "embedding", nCentroids = 2),
        "vec_id", "embedding", k = 5, nProbe = 2))
      assert(synced === rebuilt, "synced index diverged from the from-scratch build")
      // the cross-batch update is served with its NEW vector: id 3 now
      // ranks inside cluster 1 for the cluster-1 probe
      val n3 = Similarity.ivfQuerySynced(spark, path, probes.filter($"vec_id" === 100L),
          "vec_id", "embedding", k = 5, nProbe = 2)
        .filter($"neighbor_id" === 3L).select($"cosine").head().getDouble(0)
      assert(n3 > 0.9, s"updated vector not superseding: id 3 scored $n3")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("index-sync sink REBUILDS the IVF index when its recorded corpus version left the retention window") {
    // the IVF leg of the q205 contract (exact+sig are gate-pinned there):
    // a stream resumed after out-of-band commits vacuumed its recorded
    // `_corpus-v` version must rebuild from the table's CURRENT state —
    // a diff from the vacuumed version is both unreadable and wrong (it
    // cannot see the gap commits).
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Similarity
    import graft.sources.Store
    val table = "ivf_vac_docs"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = java.nio.file.Files.createTempDirectory("ivfvac").toString + "/idx"
    def start(stream: org.apache.spark.sql.DataFrame, ckpt: String) =
      graft.streaming.EventStream.toStoreUpsertWithIndexSync(
        stream, table, "vec_id", "text", buckets = 2, parts = 2,
        ivfIndexPath = Some(path), nCentroids = 2,
        checkpointLocation = Some(ckpt))
    val in1 = MemoryStream[(Long, Seq[Float])]
    val q1 = start(in1.toDF().toDF("vec_id", "embedding"),
      java.nio.file.Files.createTempDirectory("ivfvac-c1").toString)
    try {
      in1.addData(
        (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f, 0f)),
        (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0.1f, 0.9f, 0f)))
      q1.processAllAvailable()
    } finally q1.stop()
    val recorded = Similarity.ivfSyncedCorpusVersion(spark, path).get
    try {
      // the gap: retention tightens to 2 and three out-of-band UPDATES to
      // id 1 land while the stream is down, vacuuming `recorded`
      Store.setRetention(spark, table, 2)
      (1 to 3).foreach { i =>
        Store.upsert(spark, table,
          Seq((1L, Seq(0f, 1f - i * 0.01f, 0f, 0.01f * i))).toDF("vec_id", "embedding"),
          "vec_id", buckets = 2)
      }
      assert(!Store.versions(spark, table).contains(recorded),
        "fixture failed to vacuum the recorded version — the pin is vacuous")
      // resume with an insert batch: the vacuumed marker must force a
      // from-scratch rebuild (observable as a rotated index generation)
      val in2 = MemoryStream[(Long, Seq[Float])]
      val q2 = start(in2.toDF().toDF("vec_id", "embedding"),
        java.nio.file.Files.createTempDirectory("ivfvac-c2").toString)
      try {
        in2.addData((20L, Seq(0.05f, 0f, 1f, 0f)))
        q2.processAllAvailable()
      } finally q2.stop()
      val gens = new java.io.File(path).listFiles()
        .map(_.getName).filter(_.startsWith("gen-")).toSet
      assert(gens !== Set("gen-0"), "index never rebuilt — it diffed a vacuumed version")
      assert(Similarity.ivfSyncedCorpusVersion(spark, path) ===
        Some(Store.versions(spark, table).last))
      // the rebuilt index equals a from-scratch build over the FINAL
      // state — including id 1's gap updates, which no diff from the
      // vacuumed version could have produced
      val fin = Store.read(spark, table).select($"vec_id", $"embedding")
      val probes = Seq((100L, Seq(0f, 1f, 0f, 0f)), (101L, Seq(0f, 0f, 1f, 0f)))
        .toDF("vec_id", "embedding")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select($"q_id", $"rank", $"neighbor_id", round($"cosine", 9).as("c"))
          .collect().map(_.toSeq.toVector).toSet
      val synced = key(Similarity.ivfQuerySynced(spark, path, probes,
        "vec_id", "embedding", k = 5, nProbe = 2))
      val rebuilt = key(Similarity.ivfQuery(probes,
        Similarity.buildIvfIndex(fin, "vec_id", "embedding", nCentroids = 2),
        "vec_id", "embedding", k = 5, nProbe = 2))
      assert(synced === rebuilt, "rebuilt index diverged from the from-scratch build")
      // id 1 serves its GAP vector: top hit for the rotated probe
      val top = Similarity.ivfQuerySynced(spark, path,
          probes.filter($"vec_id" === 100L), "vec_id", "embedding", k = 1, nProbe = 2)
        .select($"neighbor_id").head().getLong(0)
      assert(top === 1L, s"gap update not served after rebuild (top hit $top)")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming stratified reservoir: equals the batch sample, evicts displaced members, replay is commit-free") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Training
    import graft.sources.Store
    val counts = Map("a" -> 2L)
    val dflt = 1L
    val docs = Seq(1L, 2L, 3L, 4L, 7L, 9L).map(i => (i, "a")) ++
      Seq((5L, "b"), (6L, "b"), (8L, "c"))
    val all = docs.toDF("doc_id", "lang")
    val expect = Training.stratifiedExact(all, "doc_id", "lang", counts, dflt)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expect.count(_._2 == "a") === 2 && expect.count(_._2 == "b") === 1)
    val winners = expect.map(_._1)
    // batch 1 carries ONLY non-winning a-rows (plus the c singleton):
    // the reservoir must admit them — nothing better has arrived — and
    // later batches' smaller handles must then EVICT them
    val (losersA, rest) = docs.partition(d => d._2 == "a" && !winners.contains(d._1))
    assert(losersA.size >= 2, "fixture needs enough displaced a-rows to pin eviction")
    spark.sql("DROP TABLE IF EXISTS ssr_tab")
    def sampleRows() = Store.read(spark, "ssr_tab").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStream.stratifiedSampleIncremental(
      input.toDF().toDF("doc_id", "lang"), "doc_id", "lang", "ssr_tab",
      counts, dflt, buckets = 2, parts = 2)
    try {
      input.addData(losersA ++ Seq((8L, "c")): _*)
      q.processAllAvailable()
      val after1 = sampleRows()
      assert(after1.count(_._2 == "a") === 2, "reservoir under-filled before winners arrived")
      input.addData(rest.filterNot(_ == (8L, "c")): _*)
      q.processAllAvailable()
      assert(sampleRows() === expect, "streamed reservoir diverged from the batch sample")
      assert((after1 -- expect).nonEmpty, "no displaced member was ever held — eviction unpinned")
      assert(graft.streaming.EventStream.readStratifiedSample(
          spark, "ssr_tab", "doc_id", "lang", counts, dflt)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet === expect)
    } finally q.stop()
    // full replay against the converged table: every diff must come out
    // empty, observable as ZERO new store commits (version-stable)
    val vBefore = Store.versions(spark, "ssr_tab").toSeq
    val input2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.EventStream.stratifiedSampleIncremental(
      input2.toDF().toDF("doc_id", "lang"), "doc_id", "lang", "ssr_tab",
      counts, dflt, buckets = 2, parts = 2)
    try {
      input2.addData(docs: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Store.versions(spark, "ssr_tab").toSeq === vBefore,
      "replay committed — the no-op diffs wrote something")
    assert(sampleRows() === expect)
    // crash window: a trigger upserted its admissions but died before the
    // delete, leaving an over-quota stratum — simulated by forcing a
    // displaced row back in. The replay's added-diff is EMPTY, so only
    // the unguarded evicted-diff can converge the stored state.
    val displaced = losersA.head
    Store.upsert(spark, "ssr_tab", Seq(displaced).toDF("doc_id", "lang"), "doc_id", 2)
    assert(sampleRows() !== expect, "crash fixture did not perturb the table")
    val input3 = MemoryStream[(Long, String)]
    val q3 = graft.streaming.EventStream.stratifiedSampleIncremental(
      input3.toDF().toDF("doc_id", "lang"), "doc_id", "lang", "ssr_tab",
      counts, dflt, buckets = 2, parts = 2)
    try {
      input3.addData(docs: _*)
      q3.processAllAvailable()
    } finally q3.stop()
    assert(sampleRows() === expect, "replay did not converge the over-quota stratum")
    spark.sql("DROP TABLE IF EXISTS ssr_tab")
  }

  test("streaming weighted reservoir: equals the batch ES draw; a heavy late arrival evicts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Training
    import graft.sources.Store
    // ids 1..8 with weight 1, id 9 with weight 10000 — the paper's
    // proportionality makes 9 near-certain to sample; feed it LAST so its
    // admission must evict whichever light row held the seat
    val docs = (1L to 8L).map(i => (i, 1L)) :+ (9L, 10000L)
    val all = docs.toDF("doc_id", "w")
    val n = 3
    val expect = Training.weightedSample(all, "doc_id", "w", n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.contains((9L, 10000L)),
      "fixture's dominant weight did not win — the eviction pin would be vacuous")
    spark.sql("DROP TABLE IF EXISTS wsr_tab")
    def rows() = Store.read(spark, "wsr_tab").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val input = MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStream.weightedSampleIncremental(
      input.toDF().toDF("doc_id", "w"), "doc_id", "w", "wsr_tab", n,
      buckets = 2, parts = 2)
    try {
      input.addData(docs.init: _*)
      q.processAllAvailable()
      val before = rows()
      assert(before.size === n && !before.exists(_._1 == 9L))
      input.addData(docs.last)
      q.processAllAvailable()
      assert(rows() === expect, "streamed weighted reservoir diverged from the batch draw")
      assert((before -- expect).nonEmpty, "the heavy arrival evicted nothing")
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS wsr_tab")
  }

  test("streaming distinct sketch: exact in coupon range, duplicate re-delivery moves nothing, null batch skipped") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Store
    spark.sql("DROP TABLE IF EXISTS dsk_tab")
    def storedBytes(): Array[Byte] = Store.read(spark, "dsk_tab")
      .select(col("sketch")).head().getAs[Array[Byte]](0)
    val toV = (b: org.apache.spark.sql.DataFrame) => b.select(col("v").as("value"))
    // 300 distinct values stay inside the lgK=12 coupon range, where the
    // DataSketches estimate is EXACT — so the maintained sketch is
    // pinned to equality, not a tolerance band
    val batchA = (1L to 200L).map(i => s"val-$i")
    val batchB = (150L to 300L).map(i => s"val-$i") // overlaps A
    val input = MemoryStream[String]
    val q = graft.streaming.EventStream.distinctSketchIncremental(
      input.toDF().toDF("v"), toV, "dsk_tab")
    try {
      input.addData(batchA: _*)
      q.processAllAvailable()
      input.addData(batchB: _*)
      q.processAllAvailable()
      assert(graft.streaming.EventStream.readDistinctSketch(spark, "dsk_tab") === 300L,
        "coupon-range estimate must be exact")
    } finally q.stop()
    val vBefore = Store.versions(spark, "dsk_tab").toSeq
    // duplicate re-delivery (the at-least-once shape): union is
    // register-wise max, so the stored VALUE cannot move — the
    // estimate stays exactly 300 and the table still serves one row.
    // (Version stability is NOT the contract: a union result's
    // serialization carries estimator bookkeeping that may move even
    // when no register does — see the sink's scaladoc.)
    val input2 = MemoryStream[String]
    val q2 = graft.streaming.EventStream.distinctSketchIncremental(
      input2.toDF().toDF("v"), toV, "dsk_tab")
    try {
      input2.addData(batchB: _*)
      q2.processAllAvailable()
      // a batch whose values are all NULL aggregates to an EMPTY
      // sketch and is skipped outright — no union, no write
      val vAfterDup = Store.versions(spark, "dsk_tab").toSeq
      input2.addData(null.asInstanceOf[String])
      q2.processAllAvailable()
      assert(Store.versions(spark, "dsk_tab").toSeq === vAfterDup,
        "an all-null batch committed a version")
    } finally q2.stop()
    assert(Store.versions(spark, "dsk_tab").size === vBefore.size,
      "retention window drifted") // last-2 manifests, before and after
    assert(graft.streaming.EventStream.readDistinctSketch(spark, "dsk_tab") === 300L,
      "duplicate re-delivery moved the estimate")
    assert(Store.read(spark, "dsk_tab").count() === 1L)
    spark.sql("DROP TABLE IF EXISTS dsk_tab")
  }

  test("streaming quantile sketch: exact below k, batch-id guard refuses re-folds, empty batch commits nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Store
    spark.sql("DROP TABLE IF EXISTS qsk_tab")
    val toV = (b: org.apache.spark.sql.DataFrame) => b.select(col("v").as("value"))
    // 150 values < k=200: no KLL compaction → the maintained sketch is
    // EXACT and deterministic, so quantiles pin to equality
    val input = MemoryStream[Int]
    val q = graft.streaming.EventStream.quantileSketchIncremental(
      input.toDF().toDF("v"), toV, "qsk_tab", k = 200)
    try {
      input.addData(1 to 100: _*)
      q.processAllAvailable()
      input.addData(101 to 150: _*)
      q.processAllAvailable()
    } finally q.stop()
    val (qs, n) = graft.streaming.EventStream.readQuantileSketch(
      spark, "qsk_tab", Seq(0.5, 1.0))
    assert(n === 150L, "merge across triggers must add weight exactly once")
    assert(qs.toMap === Map(0.5 -> 75.0, 1.0 -> 150.0))
    // the guard, probed directly: both already-applied ids (0 and 1)
    // refuse the fold and leave the stored row byte-identical — KLL
    // merge is NOT idempotent, so this structural no-op IS the
    // at-least-once contract (contrast the HLL sink's union algebra)
    def stored() = Store.read(spark, "qsk_tab")
      .select(col("sketch"), col("last_batch")).head()
    val before = stored()
    assert(before.getLong(1) === 1L)
    // == last_batch: the one legitimate replay → refused quietly;
    // < last_batch: id regression (fresh checkpoint) → fails LOUDLY
    val folded1 = graft.streaming.EventStream.applyQuantileBatch(
      (1 to 100).toDF("v"), toV, "qsk_tab", batchId = 1L, k = 200)
    assert(!folded1, "guard let the replayed id re-fold")
    val regress = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyQuantileBatch(
        (1 to 100).toDF("v"), toV, "qsk_tab", batchId = 0L, k = 200)
    }
    assert(regress.getMessage.contains("regressed"))
    val after = stored()
    assert(java.util.Arrays.equals(
      before.getAs[Array[Byte]](0), after.getAs[Array[Byte]](0)))
    assert(after.getLong(1) === 1L)
    // an all-null batch adds nothing but ADVANCES the guard (a later
    // replay of that id must not fold a retried non-empty variant twice)
    val vBefore = Store.versions(spark, "qsk_tab").size
    val empt = graft.streaming.EventStream.applyQuantileBatch(
      Seq(Option.empty[Int]).toDF("v"), toV, "qsk_tab", batchId = 2L, k = 200)
    assert(empt && stored().getLong(1) === 2L)
    assert(Store.versions(spark, "qsk_tab").size >= vBefore)
    val (_, n2) = graft.streaming.EventStream.readQuantileSketch(
      spark, "qsk_tab", Seq(0.5))
    assert(n2 === 150L, "empty batch changed the absorbed count")
    spark.sql("DROP TABLE IF EXISTS qsk_tab")
  }

  test("durable streaming CMS: counts add across triggers, guard refuses re-folds byte-stably") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Store
    spark.sql("DROP TABLE IF EXISTS cms_tab")
    val toV = (b: org.apache.spark.sql.DataFrame) => b.select(col("v").as("value"))
    // wide eps → tiny table; counts still EXACT here because the test
    // vocabulary (3 values) has no hash collisions to speak of at the
    // never-under/upper-bound level the assertions use
    val input = MemoryStream[String]
    val q = graft.streaming.EventStream.cmsSketchIncremental(
      input.toDF().toDF("v"), toV, "cms_tab", eps = 0.01, seed = 7)
    try {
      input.addData(Seq.fill(10)("a") ++ Seq.fill(5)("b"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(3)("a") ++ Seq.fill(4)("c"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val ests = graft.streaming.EventStream.readCmsEstimates(spark, "cms_tab",
        Seq("a", "b", "c").toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS never underestimates; with this tiny vocab the upper bound is
    // tight enough to pin the cross-trigger addition (13 = 10 + 3)
    assert(ests("a") >= 13L && ests("b") >= 5L && ests("c") >= 4L)
    assert(ests.values.sum <= 22L + 22L, "upper bounds blew past eps*N")
    def state() = Store.read(spark, "cms_tab")
      .select(col("sketch"), col("last_batch")).head()
    val before = state()
    assert(before.getLong(1) === 1L)
    // == : legitimate replay refused quietly; < : regression fails loudly
    val folded1 = graft.streaming.EventStream.applyCmsBatch(
      Seq("a").toDF("v"), toV, "cms_tab", batchId = 1L, eps = 0.01, seed = 7)
    assert(!folded1, "guard let the replayed id re-fold")
    val regress = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyCmsBatch(
        Seq("a").toDF("v"), toV, "cms_tab", batchId = 0L, eps = 0.01, seed = 7)
    }
    assert(regress.getMessage.contains("regressed"))
    val after = state()
    assert(java.util.Arrays.equals(
      before.getAs[Array[Byte]](0), after.getAs[Array[Byte]](0)))
    // an all-null batch adds nothing but advances the guard
    val empt = graft.streaming.EventStream.applyCmsBatch(
      Seq(Option.empty[String]).toDF("v"), toV, "cms_tab",
      batchId = 2L, eps = 0.01, seed = 7)
    assert(empt && state().getLong(1) === 2L)
    spark.sql("DROP TABLE IF EXISTS cms_tab")
  }

  test("sketch sinks refuse a restart at different sketch params instead of blending accuracies") {
    implicit val sqlCtx = spark.sqlContext
    Seq("pm_kll", "pm_cms", "pm_theta", "pm_gq").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    val toV = (b: org.apache.spark.sql.DataFrame) => b.select(col("v").as("value"))
    val toKV = (b: org.apache.spark.sql.DataFrame) =>
      b.select(col("k").as("key"), col("v").as("value"))
    // build each state at one accuracy, re-apply at another: the merge
    // would silently adopt the smaller k / trim the retained set /
    // misalign CMS cells, so every applier must throw
    assert(graft.streaming.EventStream.applyQuantileBatch(
      (1 to 50).toDF("v"), toV, "pm_kll", batchId = 0L, k = 200))
    val eKll = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyQuantileBatch(
        (51 to 60).toDF("v"), toV, "pm_kll", batchId = 1L, k = 400)
    }
    assert(eKll.getMessage.contains("k=200") && eKll.getMessage.contains("k=400"))
    assert(graft.streaming.EventStream.applyCmsBatch(
      Seq("a", "b").toDF("v"), toV, "pm_cms", batchId = 0L, eps = 0.01, seed = 7))
    val eCms = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyCmsBatch(
        Seq("c").toDF("v"), toV, "pm_cms", batchId = 1L, eps = 0.001, seed = 7)
    }
    assert(eCms.getMessage.contains("eps=0.01"))
    assert(graft.streaming.EventStream.applyThetaBatch(
      Seq("x", "y").toDF("v"), toV, "pm_theta", lgK = 12))
    val eTheta = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyThetaBatch(
        Seq("z").toDF("v"), toV, "pm_theta", lgK = 10)
    }
    assert(eTheta.getMessage.contains("lgK=12"))
    assert(graft.streaming.EventStream.applyGroupedQuantileBatch(
      Seq(("g", 1), ("g", 2)).toDF("k", "v"), toKV, "pm_gq", batchId = 0L, k = 200))
    val eGq = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyGroupedQuantileBatch(
        Seq(("g", 3)).toDF("k", "v"), toKV, "pm_gq", batchId = 1L, k = 100)
    }
    assert(eGq.getMessage.contains("k=200"))
    // matching params continue folding normally after the refusals
    assert(graft.streaming.EventStream.applyQuantileBatch(
      (51 to 60).toDF("v"), toV, "pm_kll", batchId = 1L, k = 200))
    Seq("pm_kll", "pm_cms", "pm_theta", "pm_gq").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming theta sketch: exact below k, re-delivery commits NOTHING, overlap algebra served") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Store
    import graft.functions.SketchAggs
    spark.sql("DROP TABLE IF EXISTS tsk_tab")
    val toV = (b: org.apache.spark.sql.DataFrame) => b.select(col("v").as("value"))
    // 300 distinct < k=4096: exact mode — estimates pin to equality
    val input = MemoryStream[String]
    val q = graft.streaming.EventStream.thetaSketchIncremental(
      input.toDF().toDF("v"), toV, "tsk_tab")
    try {
      input.addData((1 to 200).map(i => s"val-$i"): _*)
      q.processAllAvailable()
      input.addData((150 to 300).map(i => s"val-$i"): _*) // overlaps batch 1
      q.processAllAvailable()
    } finally q.stop()
    def bytes() = Store.read(spark, "tsk_tab")
      .select(col("sketch")).head().getAs[Array[Byte]](0)
    assert(SketchAggs.thetaEstimate(bytes()) === 300.0)
    val (before, vBefore) = (bytes(), Store.versions(spark, "tsk_tab").toSeq)
    // duplicate re-delivery through a SECOND sink instance: theta bytes
    // are a pure function of the set, so the dedup is EXACT — no write,
    // no version, byte-identical state (stronger than the HLL sink's
    // best-effort dedup); an all-null batch likewise commits nothing
    val input2 = MemoryStream[String]
    val q2 = graft.streaming.EventStream.thetaSketchIncremental(
      input2.toDF().toDF("v"), toV, "tsk_tab")
    try {
      input2.addData((150 to 300).map(i => s"val-$i"): _*)
      q2.processAllAvailable()
      input2.addData(null.asInstanceOf[String])
      q2.processAllAvailable()
    } finally q2.stop()
    assert(java.util.Arrays.equals(bytes(), before), "re-delivery moved the bytes")
    assert(Store.versions(spark, "tsk_tab").toSeq === vBefore,
      "re-delivery or a null batch committed a version")
    // read-time set algebra against a reference sketch
    val ref = (250 to 400).map(i => s"val-$i").toDF("v")
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val (est, inter, only) = graft.streaming.EventStream
      .readThetaOverlap(spark, "tsk_tab", ref)
    assert((est, inter, only) === ((300.0, 51.0, 249.0)))
    spark.sql("DROP TABLE IF EXISTS tsk_tab")
  }

  test("grouped quantile sketch: per-key sub-k exactness, pruned probe, atomic per-key replay guard") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Store
    spark.sql("DROP TABLE IF EXISTS gqs_tab")
    val toKV = (b: org.apache.spark.sql.DataFrame) =>
      b.select(col("k").as("key"), col("v").as("value"))
    // two keys, 60 values each (sub-k → exact); key "a" spans both
    // triggers, key "b" arrives only in the second
    val input = MemoryStream[(String, Int)]
    val q = graft.streaming.EventStream.groupedQuantileSketchIncremental(
      input.toDF().toDF("k", "v"), toKV, "gqs_tab", k = 200)
    try {
      input.addData((1 to 30).map(i => ("a", i)): _*)
      q.processAllAvailable()
      input.addData(((31 to 60).map(i => ("a", i)) ++
        (1 to 60).map(i => ("b", i * 10))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val served = graft.streaming.EventStream
      .readGroupedQuantileSketch(spark, "gqs_tab", 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(served === Map("a" -> (30.0, 60L), "b" -> (300.0, 60L)),
      "per-key merge across triggers must be exact below k")
    // per-key replay guard: both applied ids refuse, full state byte-stable
    def state() = Store.read(spark, "gqs_tab")
      .select(col("key"), col("sk"), col("last_batch"))
      .collect().map(r => r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2))).toMap
    val before = state()
    assert(before("a")._2 === 1L && before("b")._2 === 1L)
    // == : legitimate replay refused quietly; < : regression fails loudly
    val folded1 = graft.streaming.EventStream.applyGroupedQuantileBatch(
      (1 to 30).map(i => ("a", i)).toDF("k", "v"), toKV, "gqs_tab",
      batchId = 1L, k = 200)
    assert(!folded1, "guard let the replayed id re-fold")
    val regress = intercept[IllegalStateException] {
      graft.streaming.EventStream.applyGroupedQuantileBatch(
        (1 to 30).map(i => ("a", i)).toDF("k", "v"), toKV, "gqs_tab",
        batchId = 0L, k = 200)
    }
    assert(regress.getMessage.contains("regressed"))
    val after = state()
    assert(after.keySet === before.keySet)
    before.foreach { case (key, (b, lb)) =>
      assert(java.util.Arrays.equals(b, after(key)._1), s"key $key bytes moved")
      assert(after(key)._2 === lb)
    }
    // a genuinely NEW batch id touching one key folds only that key
    val folded = graft.streaming.EventStream.applyGroupedQuantileBatch(
      Seq(("b", 6100), ("b", 6200)).toDF("k", "v"), toKV, "gqs_tab",
      batchId = 2L, k = 200)
    assert(folded)
    val s3 = state()
    assert(java.util.Arrays.equals(s3("a")._1, before("a")._1),
      "untouched key's sketch moved")
    assert(s3("a")._2 === 1L, "untouched key's guard advanced")
    assert(graft.functions.SketchAggs.kllN(s3("b")._1) === 62L)
    assert(s3("b")._2 === 2L)
    spark.sql("DROP TABLE IF EXISTS gqs_tab")
  }

  test("grouped sketch empty trigger: watermark advances meta-only, zero generations (r19)") {
    import graft.sources.Store
    spark.sql("DROP TABLE IF EXISTS gqs_empty_tab")
    val toKV = (b: org.apache.spark.sql.DataFrame) =>
      b.select(col("k").as("key"), col("v").as("value"))
    def genDirs(): Seq[String] = {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier("gqs_empty_tab")
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(ident).location.toString))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      java.nio.file.Files.walk(loc).forEach { p =>
        if (java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("graft_g=")) out += loc.relativize(p).toString
      }
      out.sorted.toSeq
    }
    assert(graft.streaming.EventStream.applyGroupedQuantileBatch(
      (1 to 30).map(i => ("a", i)).toDF("k", "v"), toKV, "gqs_empty_tab",
      batchId = 0L, k = 200))
    val gens = genDirs()
    // EMPTY batch: the watermark must advance (a retried non-empty
    // variant of the same id must refuse) at ZERO staged generations
    assert(graft.streaming.EventStream.applyGroupedQuantileBatch(
      Seq.empty[(String, Int)].toDF("k", "v"), toKV, "gqs_empty_tab",
      batchId = 1L, k = 200))
    assert(genDirs() === gens, "an empty trigger must stage zero generations")
    assert(Store.manifestMeta(spark, "gqs_empty_tab")("sketch.last_batch") === "1")
    assert(!graft.streaming.EventStream.applyGroupedQuantileBatch(
      (1 to 30).map(i => ("a", i)).toDF("k", "v"), toKV, "gqs_empty_tab",
      batchId = 1L, k = 200),
      "a non-empty retry of the empty-committed id must refuse")
    // and the stream continues normally past the empty trigger
    assert(graft.streaming.EventStream.applyGroupedQuantileBatch(
      Seq(("b", 100)).toDF("k", "v"), toKV, "gqs_empty_tab",
      batchId = 2L, k = 200))
    val served = graft.streaming.EventStream
      .readGroupedQuantileSketch(spark, "gqs_empty_tab", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(served === Map("a" -> 30L, "b" -> 1L))
    spark.sql("DROP TABLE IF EXISTS gqs_empty_tab")
  }

  test("cross-modal sink replay guard: a full re-run over the same source leaves labels unchanged") {
    import graft.sources.Store
    // undecodable media payloads (filtered out scan-side — also pins that
    // all-filtered batches don't poison the banded index dirs); the text
    // modality alone drives the clusters
    val junk = Array[Byte](1, 2, 3)
    val docs = Seq(
      (1L, "shared duplicate body"), (2L, "shared duplicate body"),
      (3L, "unique three"), (4L, "unique four"),
      (5L, "another dup"), (6L, "another dup"))
    val media = docs.map { case (id, t) => (id, junk, junk, t) }
      .toDF("doc_id", "img", "wav", "text")
    val root = java.nio.file.Files.createTempDirectory("xmreplay").toString
    val srcDir = s"$root/src"
    media.repartition(2, col("doc_id")).write.mode("overwrite").parquet(srcDir)
    Seq("xmr_fp", "xmr_lab", "xmr_fwd").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def run(tag: String): Unit = {
      val stream = spark.readStream.schema(media.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStream.crossModalIncremental(
        stream, s"$root/img", s"$root/aud", "xmr_fp", "xmr_lab", "xmr_fwd",
        s"$root/pairs", checkpointLocation = Some(s"$root/ck$tag"))
      try q.processAllAvailable()
      finally q.stop()
    }
    try {
      run("1")
      // the lazy two-table scheme resolves through the forward table —
      // the stored label row may be stale, never wrong about membership
      def labels() = graft.ops.Components
        .resolvedLabels(spark, "xmr_lab", "xmr_fwd", "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val first = labels()
      assert(first === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
      // a FRESH checkpoint replays every batch against the already-
      // advanced indexes and labels — the at-least-once worst case; the
      // anti-join newIds guard must keep every label intact
      run("2")
      assert(labels() === first, "replay disturbed the labeling")
      val pairs = spark.read.parquet(s"$root/pairs").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(pairs === Set((1L, 2L, "text"), (5L, 6L, "text")))
    } finally Seq("xmr_fp", "xmr_lab", "xmr_fwd")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
