package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Store

/** CHANGELOG-DRIVEN INDEX MAINTENANCE — the operator that closes the CDC
  * loop (r12 verdict #1): [[graft.sources.Store.changes]] produces the
  * keyed insert/update/delete diff between two table versions; the
  * functions here APPLY that changelog to each incremental derived index
  * the curation pipelines probe, so a mutated corpus's indexes converge to
  * exactly what a from-scratch rebuild over the post-state would produce —
  * without ever rescanning the corpus.
  *
  * This is the engine-native analog of the refresh guarantee the
  * reference's pipeline inherits from Elasticsearch: every
  * `es.index(id=...)` call there is immediately searchable
  * (`/root/reference/src/elasticsearch_ingest.py:146` forces the refresh);
  * here, `upsert → changes → sync*Index` makes the dedup/near-dup/novelty
  * indexes immediately correct for the same mutation, at O(changelog)
  * cost.
  *
  * == Cost contract ==
  *
  * Every index is itself a generational [[graft.sources.Store]] table
  * KEYED so that applying a changelog is a pure keyed upsert/delete:
  *
  *  - exact-dedup index: keyed on the DOC id, one 16-byte fingerprint per
  *    doc. Sync = upsert the changed docs' fingerprints, delete the
  *    deleted docs' rows — O(changelog) rows staged, nothing read.
  *  - near-dup signature index: keyed on the DOC id, k longs per doc
  *    (the `oldSigs` side of [[Dedup.incrementalCandidates]]). Same
  *    upsert/delete shape; a post-image too short to sign (< w tokens, or
  *    NULL) is a DELETE of its index row, not a skip — an update can
  *    shrink a doc out of the signable set.
  *  - novelty first-occurrence index: keyed on the SHINGLE
  *    ([[Training.noveltyFirstIndex]]'s `(shingle, first_id)`). Sync
  *    min-merges the changed docs' shingle mins into the stored mins; the
  *    WRITE is O(changed shingles), and the min-merge probe is a
  *    shingle-keyed equi-join against the index (bucketed on the shingle,
  *    so it co-locates — the one sync whose probe touches the index
  *    side at all, because min is not blindly overwritable).
  *
  * IndexSyncSpec pins the contract both ways: each synced index equals the
  * from-scratch rebuild row-for-row, and the exact/signature applies run
  * the SAME number of Spark jobs regardless of how large the indexed
  * corpus is (the O(changelog)-not-O(table) claim, made executable).
  *
  * == Novelty deletes ==
  *
  * [[syncNoveltyIndex]] applies inserts and updates only. A DELETE does
  * not retract first-occurrences: novelty scores a new batch against
  * everything the corpus has EVER seen (the q126 operating mode), and
  * retracting a min requires per-shingle membership — the classic
  * non-invertible-aggregate problem, which an O(changelog) apply cannot
  * solve and a curation pipeline does not want solved (a deleted doc's
  * text was still seen; re-admitting near-copies of it as "novel" would
  * reopen the dedup hole the index exists to close).
  */
object IndexSync {

  /** Table property on an INDEX table recording the corpus version its
    * content reflects — the bookkeeping that makes continuous sync safe
    * under at-least-once delivery (code-review r13 second-pass #1): a
    * consumer diffs from the index's OWN recorded version, never from
    * "the span my upsert happened to commit", so a crash between a
    * corpus commit and the index apply re-diffs the missed span on
    * replay instead of silently skipping it (the replayed upsert's own
    * span diffs value-empty). Re-applying an already-applied changelog
    * converges on every index: the TABLE-BACKED syncs are keyed writes
    * of deterministic values (idempotent outright), and the IVF sync is
    * tombstone-then-append — the replay's higher version supersedes the
    * earlier apply instead of duplicating it (r14) — so marking AFTER
    * the apply is safe.
    */
  private val SyncedVProp = "graft.synced.corpus.version"

  /** The corpus version `indexTable`'s content reflects, if recorded. */
  def syncedVersion(spark: SparkSession, indexTable: String): Option[Long] = graft.tools.DriverProf.time("sync.syncedVersion") {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(indexTable)
    spark.sessionState.catalog.getTableMetadata(ident)
      .properties.get(SyncedVProp).map(_.toLong)
  }

  /** Record that `indexTable` now reflects corpus version `version`.
    * The name is parsed and re-quoted PART BY PART (`` `db`.`idx` ``),
    * matching [[syncedVersion]]'s resolution — backtick-quoting the whole
    * string would treat a database-qualified name as one unqualified
    * identifier and mark the wrong (or no) table (ADVICE r14).
    */
  def markSynced(spark: SparkSession, indexTable: String, version: Long): Unit =
    graft.tools.DriverProf.time("sync.markSynced") {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(indexTable)
      spark.sql(s"ALTER TABLE ${ident.quotedString} SET TBLPROPERTIES " +
        s"('$SyncedVProp' = '$version')")
      ()
    }

  private val Inserts = Seq("insert", "update")

  private def postImages(changelog: DataFrame): DataFrame =
    changelog.filter(col("change_type").isin(Inserts: _*))

  private def deletions(changelog: DataFrame, idCol: String): DataFrame =
    changelog.filter(col("change_type") === "delete").select(col(idCol))

  // ------------------------------------------------------------ exact dedup

  /** Build the exact-dedup fingerprint index for a corpus as a Store table
    * keyed on the doc id: `(id, fingerprint)`. The doc-keyed membership
    * form (rather than `fingerprint → keeper` directly) is what makes CDC
    * application a blind keyed write — the keeper view derives on read
    * ([[exactKeeperView]]).
    */
  def buildExactIndex(
      spark: SparkSession, corpus: DataFrame, table: String,
      idCol: String, textCol: String, buckets: Int = 4, parts: Int = 8): Unit =
    Store.bulkWrite(
      corpus.select(col(idCol), Dedup.exactFingerprint(col(textCol)).as("fingerprint")),
      table, idCol, buckets = buckets, parts = parts, validateKeys = true)

  /** Apply a [[graft.sources.Store.changes]] changelog to the exact-dedup
    * index: changed docs' post-image fingerprints upsert by doc id,
    * deleted docs' rows tombstone. Two O(batch) Store commits, nothing
    * else — the index is never read.
    */
  def syncExactIndex(
      spark: SparkSession, changelog: DataFrame, table: String,
      idCol: String, textCol: String): Unit = {
    // lazy persist (the nearDupIncremental rule): the upsert's validation
    // job fills the cache, the three later actions reuse it — without
    // this, each store action re-runs the manifest-pruned full-outer diff.
    // An already-MATERIALIZED changelog skips the persist: the streaming
    // sink hands it localCheckpointed (payload post-images never collect
    // driver-side, r18), so its blocks are cached and a persist would
    // only double-buffer them; and caching a LocalRelation would wrap it
    // in an InMemoryRelation and turn every derived frame's free
    // driver-side evaluation back into a cache-scan job (r17).
    val local = Store.isMaterialized(changelog)
    val ch = if (local) changelog else changelog.persist()
    try {
      // changelog-bounded frames → localized (r17): the upsert/delete
      // stats and routing run driver-side under the cap
      Store.upsert(spark, table,
        Store.localized(postImages(ch)
          .select(col(idCol), Dedup.exactFingerprint(col(textCol)).as("fingerprint"))),
        idCol)
      Store.delete(spark, table, Store.localized(deletions(ch, idCol)), idCol)
    } finally { if (!local) ch.unpersist(); () }
  }

  /** The `fingerprint → (keeper, n_copies)` view over the membership
    * index — the `oldIndex` shape [[Dedup.incrementalExactKeepers]]
    * probes. One map-combinable aggregate over (id, fingerprint) pairs:
    * 24 bytes per doc, never the corpus.
    */
  def exactKeeperView(spark: SparkSession, table: String, idCol: String): DataFrame =
    Store.read(spark, table)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  // --------------------------------------------------------- near-dup sigs

  /** Build the MinHash signature index (the persisted `oldSigs` of
    * [[Dedup.incrementalCandidates]]) as a doc-keyed Store table:
    * `(id, s0..s{k-1})`. Docs too short to sign are absent, exactly as in
    * the batch pipeline.
    */
  def buildSignatureIndex(
      spark: SparkSession, corpus: DataFrame, table: String,
      idCol: String, textCol: String, k: Int = 4, w: Int = 3,
      buckets: Int = 4, parts: Int = 8): Unit =
    Store.bulkWrite(
      Dedup.minhashSignaturesScanLocal(corpus, idCol, textCol, k, w),
      table, idCol, buckets = buckets, parts = parts, validateKeys = true)

  /** Apply a changelog to the signature index: changed docs re-sign
    * scan-locally and upsert; hard deletes AND sign-less post-images
    * (NULL text or < w tokens after an update) tombstone — an id the
    * batch rebuild would not emit must not linger in the index, or
    * [[Dedup.incrementalCandidates]] would pair new docs against a stale
    * signature. O(changelog): the only frames touched are the changelog
    * and its signatures.
    */
  def syncSignatureIndex(
      spark: SparkSession, changelog: DataFrame, table: String,
      idCol: String, textCol: String, k: Int = 4, w: Int = 3): Unit = {
    // same lazy-persist rule as syncExactIndex: four store actions read
    // the changelog (sig upsert stats/write, sign-less anti-join, delete)
    // — and the same local-frame skip (see there)
    val local = Store.isMaterialized(changelog)
    val ch = if (local) changelog else changelog.persist()
    try {
      val post = postImages(ch)
      // the SIGNATURES are the expensive derivation here (shingle + k
      // hash passes per doc), and four actions read them (the upsert's
      // stats job and write, the sign-less anti-join inside the delete's
      // stats, and the delete's write) — the cached changelog makes the
      // re-derives cheap to SCAN but not to COMPUTE, so materialize the
      // signatures once (measured ~4 signature passes/trigger at the
      // q194 gate without this)
      val sigs = Store.localized(
        Dedup.minhashSignaturesScanLocal(post, idCol, textCol, k, w))
      Store.upsert(spark, table, sigs, idCol)
      val signless = post.select(col(idCol))
        .join(sigs.select(col(idCol)), Seq(idCol), "left_anti")
      Store.delete(spark, table,
        Store.localized(deletions(ch, idCol).unionByName(signless)), idCol)
    } finally { if (!local) ch.unpersist(); () }
  }

  // ------------------------------------------------------------- ANN / IVF

  /** Apply a changelog to a stored IVF index (r13 — the last derived-index
    * family without CDC wiring): changed docs' post-image vectors append
    * versioned under the STORED codebook (no retraining — the
    * [[Similarity.appendIvfIndex]] rule), and EVERY changed id is
    * tombstoned at the same version. O(batch): the indexed corpus is
    * never rescanned. Serve the synced index via
    * [[Similarity.ivfQuerySynced]] (or the quantized sibling); codebook
    * drift and backlog bloat are the probe → rebuild loop
    * ([[Similarity.maintainIvfIndex]]), and a rebuild folds the exclusion
    * backlog away — the Store.compact rule on the ANN surface.
    *
    * == Exactly-once under replay and crash (r14) ==
    *
    * TOMBSTONE-THEN-APPEND: inserts are tombstoned alongside updates and
    * deletes (harmless for a genuinely new id — its own same-version row
    * survives the `≥` resolution), so RE-APPLYING a changelog supersedes
    * rather than duplicates: the replay's higher-version tombstones
    * retire the earlier apply's rows, and resolution serves exactly one
    * row per live id (ADVICE r14 #1 — the blind re-append this replaced
    * served every replayed id twice). TWO-PHASE COMMIT: all writes land
    * under an intent version that readers ignore until the final
    * `_sync-N.ready` marker ([[Similarity.commitSyncVer]]), so a sync
    * killed anywhere mid-write is invisible and its retry converges —
    * the same intent → data → ready discipline as the Store manifest.
    */
  def syncIvfIndex(
      spark: SparkSession, changelog: DataFrame, indexPath: String,
      idCol: String, vecCol: String, quantized: Boolean = false): Unit = {
    // local-frame skip (see syncExactIndex): with a driver-local
    // changelog the two isEmpty probes below run without a job
    val local = Store.isMaterialized(changelog)
    val ch = if (local) changelog else changelog.persist()
    try {
      // a value-empty changelog (the at-least-once replay of an already-
      // applied span) must be a true no-op: no version burned, no empty
      // parquet dirs staged
      if (ch.isEmpty) return
      val ver = Similarity.allocateSyncVer(spark, indexPath)
      val post = postImages(ch).filter(col(vecCol).isNotNull)
      // skip the empty append half: an all-delete batch has nothing to
      // append, and an empty write would leave a data-less parquet dir
      // for later reads to trip over
      if (!post.isEmpty)
        Similarity.appendIvfIndexVersioned(
          spark, indexPath, post, idCol, vecCol, ver, quantized)
      // every changed id tombstones: updates/deletes retire the old row,
      // inserts retire nothing today but make a future re-apply of this
      // same changelog supersede instead of duplicate
      val excluded = ch.select(col(idCol)).distinct()
      Similarity.excludeIvfIds(spark, indexPath, excluded, idCol, ver)
      // the commit point — everything above is invisible until this
      Similarity.commitSyncVer(spark, indexPath, ver)
    } finally { if (!local) ch.unpersist(); () }
  }

  // --------------------------------------------------------------- novelty

  /** Build the novelty first-occurrence index
    * ([[Training.noveltyFirstIndex]]) as a shingle-keyed Store table:
    * `(shingle, first_id)`.
    */
  def buildNoveltyIndex(
      spark: SparkSession, corpus: DataFrame, table: String,
      idCol: String, textCol: String, w: Int = 3,
      buckets: Int = 4, parts: Int = 8): Unit =
    Store.bulkWrite(
      Training.noveltyFirstIndex(corpus, idCol, textCol, w),
      table, "shingle", buckets = buckets, parts = parts, validateKeys = true)

  /** Apply a changelog's inserts/updates to the novelty index: the
    * changed docs' per-shingle mins merge into the stored mins, writing
    * ONLY the shingles whose first occurrence actually changed (new
    * shingle, or a changed doc with a smaller id than the stored first).
    * Deletes are a documented no-op — see the object doc. The result
    * equals [[Training.noveltyFirstIndex]] over everything ever seen:
    * the pre-state corpus UNION every applied post-image.
    */
  def syncNoveltyIndex(
      spark: SparkSession, changelog: DataFrame, table: String,
      idCol: String, textCol: String, w: Int = 3): Unit = {
    val batchMins = Training.noveltyFirstIndex(
      postImages(changelog), idCol, textCol, w)
    // single consumer chain below (one merge join, checkpointed) — no
    // persist needed here; the checkpoint IS the reuse boundary
    val merged = batchMins
      .join(Store.read(spark, table)
        .select(col("shingle"), col("first_id").as("__stored")),
        Seq("shingle"), "left")
      .filter(col("__stored").isNull || col("first_id") < col("__stored"))
      .select(col("shingle"), col("first_id"))
    // materialize before the upsert appends to the very table the merge
    // probe reads (the Store.compact rule); the frame is bounded by the
    // changelog's changed-shingle count, not the index — localized (r17)
    // so the upsert's stats and routing run driver-side under the cap
    Store.upsert(spark, table, Store.localized(merged), "shingle")
  }
}
