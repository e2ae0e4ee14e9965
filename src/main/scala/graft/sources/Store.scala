package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, collect_set, count, first, hash, lit, max, min, pmod, row_number, struct, when}
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Managed-table layer — the engine-native replacement for the reference's
  * Elasticsearch index sinks (SURVEY §2.1 S6/S7).
  *
  *  - S6 (index-with-mapping analog): a managed table created with a
  *    DECLARED schema; writes are schema-checked against it instead of
  *    trusting inference.
  *  - S7 (bulk upsert analog): a partition-parallel bulk write — never the
  *    reference's driver-side row-by-row loop
  *    (`/root/reference/src/elasticsearch_ingest.py:107-148` indexes 1,682
  *    docs with 1,682 sequential HTTP calls; `model.py:18-24` does 9,430).
  *    Bucketing by the id column gives the same point-lookup/join locality
  *    an ES `_id` routing table provides.
  *
  * == Physical layout (generational, merge-on-read) ==
  *
  * A store table is PARTITIONED on `(graft_p, graft_g)` and BUCKETED on the id
  * within each partition dir:
  *
  *  - `graft_p = pmod(hash(id), parts)` — the hash-prefix routing partition
  *    (the analog of ES shard routing; `hash` is seed-fixed murmur3, so
  *    the key→partition mapping is stable across JVMs);
  *  - `graft_g` — the GENERATION the rows were committed in. Generation 0 is
  *    the bulk-written base; every [[upsert]] appends its batch as a new
  *    delta generation covering only the partitions its keys hash to, and
  *    [[compact]] folds a partition's delta chain back into a single
  *    generation.
  *
  * Which generations are LIVE is decided by a tiny manifest file at the
  * table root (`_manifest-N.txt`, highest N wins), written atomically
  * (tmp + rename) as the LAST step of every write. This is the same
  * staged-data + atomic-marker commit as the ANN index's generation
  * protocol ([[graft.ops.Similarity]] `commitGen`), generalized to
  * per-partition generation lists:
  *
  *  - CRASH-ATOMIC: data files are only ever ADDED (no write path deletes
  *    or overwrites a live file), and a killed writer leaves orphan
  *    generation dirs that no manifest references — invisible to readers,
  *    reclaimed by a later commit's vacuum. There is no window in which a
  *    reader can observe a half-applied upsert (StoreSpec simulates the
  *    crash between stage and commit and reads the old content).
  *  - O(batch) upserts: a delta writes ONLY the batch's rows — no
  *    copy-on-write of the touched partitions, no dynamic-partition-
  *    overwrite session conf (the r5-ADVICE blast radius is gone). The
  *    cost of an upsert is the batch, full stop.
  *  - MERGE-ON-READ: [[read]] resolves the manifest and, for partitions
  *    with >1 live generation, keeps the highest-generation row per key
  *    (one windowed rank over only those partitions' rows — single-
  *    generation partitions take the plain pruned scan, so a compacted or
  *    bulk-written table pays no merge at all).
  *  - [[compact]] is the explicit fold — the analog of the Lucene segment
  *    force-merge the reference's ES cluster runs behind its
  *    row-at-a-time ingest: many small per-upsert delta files collapse to
  *    one file per (partition, bucket), committed as a fresh generation
  *    by the same atomic manifest step.
  *
  * Writer concurrency (r19): PARTITION-DISJOINT writer threads may
  * upsert one table concurrently — a commit that loses the manifest CAS
  * rebases over the new base when the interleaved commits touched none
  * of its partitions, and refuses loudly when they did (the lost-update
  * class). The contract is per-JVM (see [[inFlightGens]]); CROSS-process
  * writers remain single-writer per table — their racing commits still
  * fail loudly via the CAS, but their in-flight staging is invisible to
  * this process's vacuum. Compactions serialize with everything (the
  * maintenance writer). Readers need no coordination ever.
  */
object Store {

  /** Internal hash-prefix partition column. */
  private val PartCol = "graft_p"

  /** Internal generation partition column (commit epoch of the row). */
  private val GenCol = "graft_g"

  /** Internal tombstone flag: a true row in a delta generation DELETES its
    * key ([[delete]]). Data column (not a partition dir) so a tombstone
    * rides the same bucketed layout as the version it shadows.
    */
  private val DelCol = "graft_del"
  private val PartsProp = "graft.parts"
  private val IdColProp = "graft.idcol"
  private val RetainProp = "graft.retain"
  private val DefaultParts = 16
  private val DefaultBuckets = 16

  private val ManifestRe = """_manifest-(\d+)\.txt""".r
  private val IntentRe = """_intent-(\d+)""".r
  private val ZmapRe = """_zmap-(\d+)\.txt""".r
  private val SchemaRe = """_schema-(\d+)\.txt""".r

  private def withPart(df: DataFrame, idCol: String, parts: Int): DataFrame =
    df.withColumn(PartCol, pmod(hash(col(idCol)), lit(parts)))

  /** Row cap for the driver-side LOCAL-FRAME fast paths below: a frame
    * whose optimized plan is a LocalRelation under this many rows gets
    * its stats/routing computed in-process instead of via a Spark job.
    * Sized like [[graft.ops.Components.MaxLocalRootEdges]] — a bounded
    * driver loop over data that is already driver-resident.
    */
  private val MaxLocalStatsRows = 200000

  /** Byte budget for [[localized]]'s RETAINED driver copy (ADVICE r17):
    * the row cap alone is blind to row WIDTH — 200k rows of document
    * text or embedding vectors is multiple GB of driver heap, not the
    * "small stats frame" the fast paths were built for. Frames whose
    * sampled collected size exceeds this stay distributed
    * (`localCheckpoint`). 64 MB: generous for every narrow frame the
    * streaming sinks localize (ids, fingerprints, signatures, sketch
    * rows), a rounding error of a sane driver heap, and far below
    * `spark.driver.maxResultSize`'s default 1 GB — so the one-job probe
    * collect below can never be the thing that kills the driver.
    */
  private val MaxLocalStatsBytes = 64L << 20

  /** Sampled estimate of the collected rows' retained heap (long-lived
    * JVM object sizes, deliberately rough — this guards an order of
    * magnitude, not a byte). Strides so a 200k-row probe costs ~512
    * row walks, not 200k.
    */
  private def approxLocalBytes(rows: Array[org.apache.spark.sql.Row]): Long = {
    def valueBytes(v: Any): Long = v match {
      case null => 8L
      case s: String => 40L + 2L * s.length
      case b: Array[Byte] => 24L + b.length
      case a: scala.collection.Seq[_] =>
        48L + a.iterator.map(valueBytes).sum
      case r: org.apache.spark.sql.Row =>
        24L + (0 until r.length).iterator.map(i => valueBytes(r.get(i))).sum
      case m: scala.collection.Map[_, _] =>
        48L + m.iterator.map { case (k, v2) => valueBytes(k) + valueBytes(v2) }.sum
      case _ => 16L
    }
    if (rows.isEmpty) 0L
    else {
      val stride = math.max(1, rows.length / 512)
      var i = 0; var sum = 0L
      while (i < rows.length) { sum += valueBytes(rows(i)); i += stride }
      sum * stride
    }
  }

  /** The frame's rows when it is a small LOCAL relation (driver-built
    * `Seq.toDF`, a collected probe result), else None. `optimizedPlan`
    * so a `toDF`-rename Project collapses first; a `localCheckpoint`ed
    * or scan-backed frame is a LogicalRDD/relation and stays on the
    * distributed path.
    */
  private def localRelationOf(df: DataFrame)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LocalRelation] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if l.data.length <= MaxLocalStatsRows => Some(l)
      case _ => None
    }

  /** A MATERIALIZED copy of a bounded frame, driver-local when small
    * (r17): collect up to `cap` rows into a LocalRelation — the
    * local-frame fast paths above then apply to every write it feeds
    * (no stats job, no routing job, coalesced write), and each later
    * consumer reads driver-resident rows — or fall back to
    * `localCheckpoint()` past the cap (the same materialization
    * contract, distributed). A drop-in for localCheckpoint at
    * batch-bounded per-trigger frames: one computation, N cheap
    * consumers, streaming lineage cut either way. The cap is the
    * bounded-driver budget ([[graft.ops.Components.MaxLocalRootEdges]]'
    * rule); an over-cap frame pays one wasted bounded scan
    * (`limit(cap+1)`) before checkpointing — the price of not knowing
    * sizes without a job. For frames whose derivation is expensive,
    * feed `localized` from an already-materialized parent
    * (localCheckpoint/persist) so the over-cap recompute re-reads
    * cached blocks, not the original pass (the streaming sinks'
    * pattern since r18).
    *
    * BYTE budget (ADVICE r17): the retained copy is also capped at
    * `maxBytes` (sampled from the collected rows) — a row-count cap
    * alone would let 200k payload rows (document text, embedding
    * vectors) pin GBs of driver heap. Payload-carrying frames should
    * not be routed here at all (the media-sink rule — localCheckpoint
    * the batch, localize only derived signature/id frames); this cap is
    * the backstop for the ones whose width isn't known statically. The
    * transient probe collect stays bounded by `cap` rows and by
    * `spark.driver.maxResultSize` (a loud error, never a silent OOM).
    */
  def localized(df: DataFrame, cap: Int = MaxLocalStatsRows,
      maxBytes: Long = MaxLocalStatsBytes, assumeLarge: Boolean = false): DataFrame = {
    // CARDINALITY SHORT-CIRCUIT (r19 — VERDICT r18 next #8): the over-cap
    // path's residual cost was the probe collect running the plan once
    // before localCheckpoint ran it again. When the caller KNOWS the
    // frame is over-cap (`assumeLarge`) or the optimizer already knows
    // (a plan-stat rowCount past the cap — free to read, present for
    // driver-resident plans and under CBO), skip the probe entirely and
    // checkpoint in ONE computation. There is no free cardinality for an
    // arbitrary distributed plan, so the default keeps the bounded probe
    // — cheap for the under-cap frames that are this helper's whole
    // point — and the probe's one wasted bounded scan remains only where
    // neither the caller nor the stats could know better.
    if (assumeLarge ||
        df.queryExecution.optimizedPlan.stats.rowCount.exists(_ > cap))
      return df.localCheckpoint()
    // A frame whose optimized plan is ALREADY a LocalRelation (Catalyst's
    // ConvertToLocalRelation folds deterministic Project/Filter/Limit
    // chains over LocalRelation driver-side) takes the same collect path
    // below — which runs NO job there (LocalTableScanExec serves
    // executeTake on the driver) — and deliberately does NOT
    // short-circuit to `df` itself: returning the lazy frame would let
    // every consumer re-run the folded projection during its own plan's
    // optimization (measured as a per-consumer driver-side re-derivation
    // of the whole signature pass in the q202 sink). The copy into a
    // fresh LocalRelation IS the materialization contract.
    // caller-attributed label under SPARK_GRAFT_PROF (dev-only): the
    // aggregate "localized.collect" number can't say WHICH frame is slow
    val label =
      if (!graft.tools.DriverProf.on) "store.localized.collect"
      else {
        val site = Thread.currentThread.getStackTrace
          .find { e =>
            val c = e.getClassName
            c.startsWith("graft.") && !c.contains("Store") && !c.contains("DriverProf")
          }
          .map(e => s"${e.getClassName.split('.').last}:${e.getLineNumber}")
          .getOrElse("?")
        s"store.localized.collect@$site"
      }
    val rows = graft.tools.DriverProf.time(label)(df.limit(cap + 1).collect())
    if (rows.length > cap || approxLocalBytes(rows) > maxBytes) df.localCheckpoint()
    else df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Whether `df` is driver-resident (a LocalRelation under the local
    * cap) — what the streaming sinks branch on to skip `persist()`
    * (caching a LocalRelation wraps it in an InMemoryRelation, which
    * DEFEATS every downstream local fast path: the optimized plan stops
    * being a LocalRelation and each consumer pays a cache-scan job).
    */
  private[graft] def isLocalFrame(df: DataFrame): Boolean =
    localRelationOf(df).isDefined

  /** Whether `df` is already MATERIALIZED — driver-resident
    * (LocalRelation) or block-cached (a `localCheckpoint`ed LogicalRDD)
    * — i.e. re-scanning it is cheap and a consumer's lazy `persist()`
    * would only add a redundant second copy. What the index-sync legs
    * branch on (r18): payload-carrying changelogs now arrive
    * localCheckpointed rather than localized, and re-persisting them
    * would double-buffer every post-image row.
    */
  private[graft] def isMaterialized(df: DataFrame): Boolean =
    isLocalFrame(df) || (df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _ => false
    })

  /** Key types whose driver-side (HashSet) equality matches SQL
    * equality — what the local stats loop's dup check relies on.
    * Binary and nested types compare by reference on the driver, so
    * they keep the distributed stats job.
    */
  private def simpleKeyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => true
      case StringType | BooleanType | DateType | TimestampType |
        TimestampNTZType => true
      case _ => false
    }
  }

  /** [[withPart]]'s routing for ONE driver-resident key, by evaluating
    * the write path's own Catalyst expressions (the [[lookup]] rule:
    * reimplementing the hash here is how key→partition drift bugs are
    * born). `keyType` is the value's own type; `idType` the table's —
    * the cast mirrors the frame version's `.cast(idType)`.
    */
  private def partEvaluator(keyType: org.apache.spark.sql.types.DataType,
      idType: org.apache.spark.sql.types.DataType, parts: Int): Any => Int = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Literal, Murmur3Hash, Pmod}
    val child: org.apache.spark.sql.catalyst.expressions.Expression =
      BoundReference(0, keyType, nullable = true)
    val expr = Pmod(new Murmur3Hash(Seq(
      if (keyType == idType) child else Cast(child, idType))), Literal(parts))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    v => { row.update(0, v); expr.eval(row).asInstanceOf[Int] }
  }

  /** The partition-count a table was created with (recorded in table
    * properties so writers from ANY session derive the same key→partition
    * mapping — `hash` is seed-fixed murmur3, stable across JVMs).
    */
  private def partsOf(spark: SparkSession, name: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident))
      .properties.get(PartsProp).map(_.toInt).getOrElse(DefaultParts)
  }

  /** The id column the table is keyed on (recorded at bulk-write time so
    * the merge-on-read rank and [[compact]] can resolve it without the
    * caller re-stating it).
    */
  /** The table's manifest-retention window: how many committed versions
    * stay readable ([[versions]] / [[readVersion]] / [[changes]]).
    * Default 2 — the in-flight-reader floor.
    */
  private def retainOf(spark: SparkSession, name: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident))
      .properties.get(RetainProp).map(_.toInt).getOrElse(2)
  }

  /** Configure the table's TIME-TRAVEL window (VERDICT r13 #6): keep the
    * last `retain` committed manifests — and every generation they
    * reference — readable, instead of the hard-coded last 2. Enforced
    * ≥ 2: the floor is what protects a reader that resolved the previous
    * manifest mid-scan, so it is not configurable away. Applies from the
    * NEXT commit's vacuum; shrinking the window prunes on the commit
    * after that. Wider windows trade disk for audit reach — superseded
    * row versions survive until their manifest leaves the window.
    */
  def setRetention(spark: SparkSession, name: String, retain: Int): Unit = {
    requireTable(spark, name)
    require(retain >= 2,
      s"retention must keep >= 2 versions (current + in-flight readers), got $retain")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    spark.sql(s"ALTER TABLE ${ident.quotedString} SET TBLPROPERTIES " +
      s"('$RetainProp' = '$retain')")
    ()
  }

  private def idColOf(spark: SparkSession, name: String): String = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident))
      .properties.getOrElse(IdColProp,
        sys.error(s"store table $name has no recorded id column — not a generational store table"))
  }

  private def tableLocation(spark: SparkSession, name: String): Path = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    new Path(graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident)).location)
  }

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every read-side entry point taking a table name checks existence
    * FIRST, so a missing table surfaces as actionable guidance instead of
    * a raw `NoSuchTableException` out of `refreshTable`/`getTableMetadata`
    * (ADVICE r13).
    */
  private def requireTable(spark: SparkSession, name: String): Unit =
    require(graft.tools.DriverProf.time("store.tableExists")(spark.catalog.tableExists(name)),
      s"store table $name does not exist — create it via bulkWrite " +
        "(generational layout) or createTable (flat declared schema)")

  /** ATOMIC exclusive create — the CAS primitive every commit lock and
    * ready marker rests on. `fs.create(p, overwrite = false)` is a true
    * atomic create-if-absent on HDFS, but on the local filesystems
    * (`RawLocalFileSystem`/`LocalFileSystem`) it decomposes into an
    * exists-check THEN a create — two racing writers can both pass the
    * check (ADVICE r14). For `file:` paths this routes through
    * `java.nio.file.Files.createFile` (O_CREAT|O_EXCL — atomic on POSIX),
    * so the "exactly one racing writer wins" guarantee holds on local FS
    * too, not just HDFS. Throws `IOException` (of which
    * `FileAlreadyExistsException` is a subtype) when the file exists.
    */
  /** session → (table → manifest version) at this session's last
    * `refreshTable` (r18): the manifest RENAME is a commit's visibility
    * point — data files are immutable and generation dirs only appear
    * under a new version — so a reader whose freshly FS-read manifest
    * version equals the recorded one knows this session's catalog and
    * file-listing caches cannot be stale, and skips the 30–90 ms
    * `refreshTable` (profiled as the #3 fixed driver cost per streaming
    * trigger after the staged-write fix). Keyed PER SESSION because
    * cloned stream sessions carry their own relation caches: one
    * session's refresh proves nothing about another's. Tables WITHOUT a
    * manifest (flat createTable tables) always refresh — they have no
    * visibility point to gate on. DDL and commit paths force-refresh
    * and re-record; destructive rebuilds invalidate every session's
    * entry.
    *
    * Keyed by the SESSION OBJECT in a weak-identity map (ADVICE r18):
    * the previous identityHashCode-string key could collide across two
    * live sessions (one session's refresh silently marking another's
    * stale caches fresh — a stale-read hazard), and entries for closed
    * stream sessions accumulated for the JVM lifetime. A WeakHashMap
    * keys on reference identity here (SparkSession keeps Object equals)
    * so collisions are impossible, and a session's whole record is
    * reclaimed by GC when the session dies. The inner value map holds
    * only strings — no strong path back to the session key.
    */
  private val refreshedAt: java.util.Map[
      SparkSession, java.util.concurrent.ConcurrentHashMap[String, String]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[
        SparkSession, java.util.concurrent.ConcurrentHashMap[String, String]])

  private def sessionRefreshes(
      spark: SparkSession): java.util.concurrent.ConcurrentHashMap[String, String] =
    refreshedAt.computeIfAbsent(
      spark, _ => new java.util.concurrent.ConcurrentHashMap[String, String])

  /** Test/gate hook: the hash-prefix routing partition of `key` under
    * `name`'s layout — what a partition-disjoint writer split computes.
    */
  private[graft] def partitionOf(spark: SparkSession, name: String, key: Any): Int = {
    val idType = spark.table(name).schema(idColOf(spark, name)).dataType
    val internal = key match {
      case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case other => other
    }
    partEvaluator(idType, idType, partsOf(spark, name))(internal)
  }

  /** Test hook (StoreSpec): whether THIS session holds a refresh record
    * for `name` — proves per-session gating independence.
    */
  private[graft] def refreshRecorded(spark: SparkSession, name: String): Boolean = {
    val m = refreshedAt.get(spark)
    m != null && m.containsKey(name)
  }

  /** The table's visibility stamp: latest manifest version AND latest
    * schema-sidecar version. Both move on disk before readers need a
    * refresh — commits bump the manifest, additive/default DDL writes a
    * sidecar ([[evolveForUpdates]]/[[addColumnWithDefault]]; in-place
    * widening is always followed by its own batch's commit) — so a
    * session whose recorded stamp matches cannot be serving stale
    * catalog caches. Empty string = no manifest (flat table): never
    * skip.
    */
  private def visibilityStamp(spark: SparkSession, name: String): String =
    try {
      val loc = tableLocation(spark, name)
      val fs = fsFor(spark, loc)
      manifestVersions(fs, loc).lastOption match {
        case None => ""
        case Some(mv) =>
          s"$mv:${schemaVersions(fs, loc).lastOption.getOrElse(-1L)}"
      }
    } catch { case _: Exception => "" }

  private def forceRefresh(spark: SparkSession, name: String): Unit = {
    graft.tools.DriverProf.time("store.refreshTable")(spark.catalog.refreshTable(name))
    val v = visibilityStamp(spark, name)
    if (v.nonEmpty) sessionRefreshes(spark).put(name, v)
    else sessionRefreshes(spark).remove(name)
    ()
  }

  private def refreshIfMoved(spark: SparkSession, name: String): Unit = {
    val v = visibilityStamp(spark, name)
    if (v.isEmpty || sessionRefreshes(spark).get(name) != v) {
      graft.tools.DriverProf.time("store.refreshTable")(spark.catalog.refreshTable(name))
      if (v.nonEmpty) sessionRefreshes(spark).put(name, v)
      ()
    }
  }

  /** Forget every session's refresh record for `name` — the rebuild
    * paths (DROP + saveAsTable) change the table identity entirely.
    */
  private def invalidateRefresh(name: String): Unit =
    refreshedAt.synchronized {
      refreshedAt.values.forEach(m => { m.remove(name); () })
    }

  /** Filesystem schemes whose `create(p, overwrite = false)` is a TRUE
    * atomic create-if-absent (a central-arbiter namespace: HDFS-class
    * NameNode schemes), plus `file` which this code routes through
    * `O_CREAT|O_EXCL` itself. S3-class object stores are deliberately
    * NOT here: their connectors decompose exclusive create into an
    * existence check THEN a PUT, so two racing writers can both
    * "win" — exactly the lost-update the manifest lock exists to
    * prevent. A deployment whose connector provides a real conditional
    * put (S3 `If-None-Match` via a supporting s3a build, GCS
    * `ifGenerationMatch: 0`) opts its scheme in via
    * [[registerAtomicCreateScheme]]; everything else is REFUSED loudly
    * at commit time rather than silently racing (r18 — VERDICT r17
    * next #4; semantics documented in SCALE.md).
    */
  private val atomicCreateSchemes: java.util.Set[String] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Seq("file", "hdfs", "viewfs", "ofs", "o3fs").foreach(s.add)
    s
  }

  /** Declare that `scheme`'s `FileSystem.create(p, overwrite = false)`
    * is backed by a true conditional put / atomic namespace operation,
    * making it safe as the manifest commit's CAS. The caller owns the
    * claim's truth — registering a non-atomic connector re-opens the
    * lost-update window the refusal exists to close.
    */
  def registerAtomicCreateScheme(scheme: String): Unit = {
    atomicCreateSchemes.add(scheme.toLowerCase(java.util.Locale.ROOT)); ()
  }

  /** Test seam: forget a registered scheme (StoreSpec's contract test
    * must not leak its opt-in into other tests).
    */
  private[graft] def deregisterAtomicCreateScheme(scheme: String): Unit = {
    atomicCreateSchemes.remove(scheme.toLowerCase(java.util.Locale.ROOT)); ()
  }

  private[graft] def exclusiveCreate(fs: FileSystem, p: Path): Unit = {
    val uri = fs.makeQualified(p).toUri
    val scheme = Option(uri.getScheme).getOrElse("file")
    require(atomicCreateSchemes.contains(scheme.toLowerCase(java.util.Locale.ROOT)),
      s"manifest commit needs an atomic create-if-absent and filesystem " +
        s"scheme '$scheme' is not known to provide one: object-store " +
        "connectors decompose create(overwrite=false) into exists-then-PUT, " +
        "so two racing writers could both believe they committed the same " +
        "version (lost update). Back the table with an HDFS-class " +
        "filesystem, or — if this connector really does a conditional put " +
        "(S3 If-None-Match, GCS ifGenerationMatch:0) — opt it in via " +
        "Store.registerAtomicCreateScheme(\"" + scheme + "\")")
    if (scheme == "file") {
      val local = java.nio.file.Paths.get(uri.getPath)
      val parent = local.getParent
      if (parent != null) java.nio.file.Files.createDirectories(parent)
      java.nio.file.Files.createFile(local)
      ()
    } else fs.create(p, false).close()
  }

  // ---------------------------------------------------------------- manifest

  /** Live generations per partition: `part → gens`, oldest first. */
  private[graft] type Manifest = Map[Int, Seq[Long]]

  private def manifestVersions(fs: FileSystem, loc: Path): Seq[Long] =
    graft.tools.DriverProf.time("store.manifestVersions") {
      if (!fs.exists(loc)) Seq.empty
      else fs.listStatus(loc).toSeq.map(_.getPath.getName)
        .collect { case ManifestRe(n) => n.toLong }.sorted
    }

  private def manifestPath(loc: Path, v: Long) = new Path(loc, s"_manifest-$v.txt")

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Commit-carried table metadata (r19 — VERDICT r18 next #3): small
    * `key=value` pairs that ride IN the manifest file, so they move
    * atomically with the partition map under the same CAS rename. The
    * streaming sketch sinks keep their exactly-once watermark
    * (`last_batch`) and accuracy params here instead of in a guard ROW:
    * an empty trigger then advances the watermark with a metadata-only
    * manifest version — ZERO generation files — where the guard row
    * cost one guard generation per empty trigger, forever, on a quiet
    * stream. Meta lines are `!key=value` (values may contain `=`); every
    * commit path carries the previous version's meta forward unchanged
    * unless the caller overrides keys.
    */
  private[graft] type ManifestMeta = Map[String, String]

  private def parseManifest(s: String): Manifest =
    s.split("\n").iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("!")).map { line =>
      val Array(p, gs) = line.split(":", 2)
      p.toInt -> gs.split(",").iterator.filter(_.nonEmpty).map(_.toLong).toSeq
    }.toMap

  private def parseMeta(s: String): ManifestMeta =
    s.split("\n").iterator.map(_.trim)
      .filter(l => l.startsWith("!") && l.contains("=")).map { line =>
        val eq = line.indexOf('=')
        line.substring(1, eq) -> line.substring(eq + 1)
      }.toMap

  private def renderManifest(m: Manifest, meta: ManifestMeta = Map.empty): String = {
    val metaLines = meta.toSeq.sortBy(_._1).map { case (k, v) =>
      require(!k.contains("=") && !k.contains("\n") && !v.contains("\n"),
        s"manifest meta key/value must be single-line, key '=' -free: $k")
      s"!$k=$v"
    }
    (metaLines ++ m.toSeq.sortBy(_._1).map { case (p, gs) => s"$p:${gs.mkString(",")}" })
      .mkString("\n")
  }

  /** Latest committed manifest, or None for a pre-generational/absent
    * layout. Package-visible for the crash-window spec.
    */
  private[graft] def readManifest(
      spark: SparkSession, name: String): Option[(Long, Manifest)] =
    readManifestFull(spark, name).map { case (v, m, _) => (v, m) }

  private[graft] def readManifestFull(
      spark: SparkSession, name: String): Option[(Long, Manifest, ManifestMeta)] = {
    // commit-group read-your-writes: a manifest read is a READ — flush
    // this table's deferred commits first (no-op outside a group)
    flushPending(spark, name)
    readManifestRaw(spark, name)
  }

  /** The flush-free manifest read: for the STAGE and COMMIT paths
    * themselves, which must see the committed state without forcing a
    * deferred same-table commit (staging against pending gens is safe —
    * intent markers keep allocation monotone past them).
    */
  private def readManifestRaw(
      spark: SparkSession, name: String): Option[(Long, Manifest, ManifestMeta)] = {
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    manifestVersions(fs, loc).lastOption.map { v =>
      val text = readText(fs, manifestPath(loc, v))
      (v, parseManifest(text), parseMeta(text))
    }
  }

  /** The latest committed manifest's metadata pairs (empty for flat /
    * pre-meta tables). Driver-side file read, no Spark job — the sketch
    * sinks' replay guard reads its watermark here.
    */
  def manifestMeta(spark: SparkSession, name: String): ManifestMeta =
    readManifestFull(spark, name).map(_._3).getOrElse(Map.empty)

  /** Atomic manifest commit, GUARDED BY EXCLUSIVE CREATE (r12 verdict
    * #4): write `_manifest-V.txt.tmp`, claim version V by exclusively
    * creating `_manifest-V.lock` ([[exclusiveCreate]] — an atomic CAS on
    * HDFS via `fs.create(overwrite = false)` AND on POSIX local FS via
    * `O_CREAT|O_EXCL`, so the claim is atomic on both, not best-effort
    * on either — ADVICE r14), re-check that V−1 really is the latest
    * committed manifest, then rename the tmp into place. Readers still see the previous version
    * or the complete new one, never a partial file (rename visibility is
    * unchanged) — the lock closes the WRITER race: plain rename is an
    * effective CAS on HDFS, but `RawLocalFileSystem.rename` silently
    * OVERWRITES an existing destination on POSIX, so two racing writers
    * could each believe they committed V while one's update was lost.
    * With the lock, exactly one writer wins the claim and the loser
    * fails loudly (StoreSpec's racing-writers test); the post-lock
    * currency check additionally catches a straggler whose claimed
    * version's lock was already vacuumed — its base manifest is stale,
    * so it fails before any manifest bytes move.
    *
    * A writer that CRASHES between lock create and rename leaves an
    * orphan lock that makes the next commit of V fail loudly — under the
    * single-writer contract that failure can only mean a crashed commit;
    * remove the lock after confirming no writer is live (no data needs
    * repair: nothing was committed, and the staged generation is
    * vacuumed as usual).
    */
  private[graft] def writeManifest(
      fs: FileSystem, loc: Path, v: Long, m: Manifest,
      meta: ManifestMeta = Map.empty): Unit = {
    // render (and so VALIDATE the meta pairs) BEFORE claiming the lock: a
    // bad meta key throwing after the claim would strand a lock that
    // blocks every later commit of this version (code-review r19)
    val rendered = renderManifest(m, meta).getBytes("UTF-8")
    val lock = new Path(loc, s"_manifest-$v.lock")
    try exclusiveCreate(fs, lock)
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"cannot claim manifest version $v of $loc — its lock already " +
            "exists. Either a concurrent writer is committing (the store is " +
            "single-writer per table: serialize upserts/compactions) or a " +
            "previous writer crashed mid-commit (remove the lock after " +
            "confirming no writer is live).", e)
    }
    val cur = manifestVersions(fs, loc).lastOption.getOrElse(-1L)
    if (cur != v - 1L) {
      // release the claim: version v is not current, so the lock guards
      // nothing — leaving it would block a later (equally stale) writer's
      // loud failure path behind a misleading "concurrent writer" message
      fs.delete(lock, false)
      throw new IllegalStateException(
        s"lost-update race detected for $loc: committing version $v but the " +
          s"latest committed manifest is $cur — this writer's base manifest " +
          "is stale; re-read the table and retry the write")
    }
    val tmp = new Path(loc, s"_manifest-$v.txt.tmp")
    val out = fs.create(tmp, true)
    out.write(rendered)
    out.close()
    require(fs.rename(tmp, manifestPath(loc, v)),
      s"manifest commit rename failed for version $v")
  }

  // ------------------------------------------------------------ schema sidecar

  private def schemaPath(loc: Path, v: Long) = new Path(loc, s"_schema-$v.txt")

  private def schemaVersions(fs: FileSystem, loc: Path): Seq[Long] =
    if (!fs.exists(loc)) Seq.empty
    else fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .collect { case SchemaRe(n) => n.toLong }.sorted

  private def writeTextFile(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The USER-visible column list of the table frame (what [[read]]
    * serves — the internal routing/generation/tombstone columns dropped).
    */
  private def userColumns(t: DataFrame): Seq[String] =
    t.columns.toSeq.filterNot(c => c == PartCol || c == GenCol || c == DelCol)

  /** The lossless in-place type WIDENINGS [[evolveForUpdates]] accepts
    * (r17 — VERDICT r16 #5): exactly the promotions the parquet reader
    * serves from existing files with no rewrite (SPARK-40876: INT32
    * pages decode as LONG, FLOAT as DOUBLE, in the vectorized reader).
    * Everything else remains a fail-loud rebuild.
    */
  private def widensTo(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      // INT32-physical parquet pages (byte/short/int) decode at any
      // wider integral width, and at double (every int32 is exact in a
      // double); FLOAT decodes as double. Each promotion verified
      // against this build's vectorized reader (StoreSpec widening
      // matrix, r18 — the r17 set was int->long / float->double only).
      case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
      case (ShortType, IntegerType | LongType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      // long->double is NOT here: longs past 2^53 lose precision, so
      // that "widening" silently corrupts keys/counters — rebuild.
      case _ => false
    }
  }

  /** SCHEMA EVOLUTION (r13 verdict #4 → r15 additive; r17 widening): an
    * upsert batch may carry columns the table does not have yet, or a
    * WIDER type for a column it has. New columns are added as NULLABLE
    * via ALTER TABLE ADD COLUMNS — data files are immutable and parquet
    * projects by NAME, so every existing generation reads the new column
    * as NULL with no rewrite — and a `_schema-<v>.txt` sidecar records
    * the column list each manifest version serves, so [[readVersion]]
    * returns the PRE-evolution shape for pre-evolution versions. A
    * shared column arriving int→long or float→double WIDENS the table
    * type in place (catalog metadata only — old generations' narrower
    * pages decode widened on read, [[widensTo]]); time travel serves
    * pre-widening versions at the widened type with unchanged values (a
    * lossless upcast). The ID column never widens in place: the layout
    * routes and buckets on murmur3 of the key AT ITS TYPE, so a widened
    * key would stop finding its own rows — that is a rebuild. A batch
    * carrying a NARROWER type than the table (the replay of a
    * pre-widening batch after the widening landed) is accepted — the
    * staged insert upcasts losslessly. Everything else stays loud: true
    * retypes are rejected here, and a batch MISSING an existing column
    * fails the staged select (a keyed upsert's post-image must carry
    * the whole row — silently NULL-filling a misspelled column is how
    * corpora rot). Sidecars are tiny, written once per evolution, never
    * vacuumed. Columns can never be dropped or arbitrarily retyped in
    * place — that is a rebuild ([[bulkWrite]]), which is what keeps
    * every retained snapshot readable forever.
    */
  private def evolveForUpdates(
      spark: SparkSession, name: String, updates: DataFrame): Unit = {
    val t = spark.table(name)
    val tableTypes = t.schema.fields.map(f => f.name -> f.dataType).toMap
    val differing = updates.schema.fields.filter(f =>
      tableTypes.get(f.name).exists(_.catalogString != f.dataType.catalogString))
    val toWiden = differing.filter(f => widensTo(tableTypes(f.name), f.dataType))
    val clash = differing.filterNot(f =>
      widensTo(tableTypes(f.name), f.dataType) ||
        widensTo(f.dataType, tableTypes(f.name)))
    require(clash.isEmpty,
      s"type change rejected for $name (evolution is additive or lossless " +
        s"widening — byte/short/int up to long or double, float->double; " +
        s"rebuild via bulkWrite to retype): " +
        clash.map(f =>
          s"${f.name}: ${tableTypes(f.name).catalogString} -> " +
            f.dataType.catalogString).mkString(", "))
    if (toWiden.nonEmpty) {
      val idCol = idColOf(spark, name)
      require(!toWiden.exists(_.name == idCol),
        s"cannot widen the id column '$idCol' of $name in place: routing and " +
          "bucketing hash the key AT ITS TYPE (murmur3 of int 7 != long 7), " +
          "so a widened key would stop finding its own rows — rebuild via " +
          "bulkWrite to re-key")
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
      val cat = spark.sessionState.catalog
      val widenMap = toWiden.map(f => f.name -> f.dataType).toMap
      val newData = org.apache.spark.sql.types.StructType(
        cat.getTableMetadata(ident).dataSchema.fields.map(f =>
          widenMap.get(f.name).map(dt => f.copy(dataType = dt)).getOrElse(f)))
      cat.alterTableDataSchema(ident, newData)
      forceRefresh(spark, name)
    }
    val extras = updates.schema.fields.filterNot(f => tableTypes.contains(f.name))
    if (extras.nonEmpty) {
      val loc = tableLocation(spark, name)
      val fs = fsFor(spark, loc)
      val curV = manifestVersions(fs, loc).lastOption.getOrElse(0L)
      // seed the pre-evolution column list once, so every retained
      // pre-evolution version resolves to it
      if (schemaVersions(fs, loc).isEmpty)
        writeTextFile(fs, schemaPath(loc, 0L), userColumns(t).mkString("\n"))
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
      val colsSql = extras.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE ${ident.quotedString} ADD COLUMNS ($colsSql)")
      forceRefresh(spark, name)
      // the widened list serves from the NEXT committed manifest version
      // (the commit that makes this batch visible)
      writeTextFile(fs, schemaPath(loc, curV + 1L),
        userColumns(spark.table(name)).mkString("\n"))
    }
  }

  /** ADD a column WITH A DECLARED DEFAULT (r18 — VERDICT r17 next #7's
    * second half): `ALTER TABLE ... ADD COLUMNS (col type DEFAULT d)`.
    * Existing generations' files lack the column and read the DEFAULT at
    * scan time (Spark's existence-default column metadata — no rewrite,
    * the same no-data-moves contract as additive evolution); new batches
    * may carry the column explicitly; and a batch MISSING it is filled
    * with the default at stage time instead of failing the whole-row
    * contract ([[stageDelta]]) — so the column can be added BEFORE its
    * producers learn to emit it, which is the order streaming deploys
    * actually happen in. Sidecar bookkeeping matches additive evolution,
    * so time travel serves pre-evolution versions at the pre-evolution
    * shape. `defaultSql` must be a constant-foldable SQL expression.
    */
  def addColumnWithDefault(
      spark: SparkSession, name: String, column: String,
      dataTypeSql: String, defaultSql: String): Unit = {
    requireTable(spark, name)
    val t = spark.table(name)
    require(!t.columns.contains(column),
      s"$name already has a column named $column")
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val curV = manifestVersions(fs, loc).lastOption.getOrElse(0L)
    if (schemaVersions(fs, loc).isEmpty)
      writeTextFile(fs, schemaPath(loc, 0L), userColumns(t).mkString("\n"))
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    spark.sql(s"ALTER TABLE ${ident.quotedString} ADD COLUMNS " +
      s"(`$column` $dataTypeSql DEFAULT $defaultSql)")
    forceRefresh(spark, name)
    writeTextFile(fs, schemaPath(loc, curV + 1L),
      userColumns(spark.table(name)).mkString("\n"))
  }

  // ------------------------------------------------------------ zmap sidecar

  /** How a Z-ordered compaction lays folded rows out: Morton-interleave
    * `dims` ([[graft.ops.Layout]]'s quantize + interleave, `bits` per
    * dim), then commit ONE GENERATION PER Z-PREFIX BUCKET
    * (`2^bucketBits` buckets). Generations within one z-compaction are
    * KEY-DISJOINT by construction (each key's newest version lands in
    * exactly one bucket), so reads over a cleanly z-compacted partition
    * skip the merge rank entirely — and [[readBox]] prunes whole
    * generations against the envelope sidecar before any file is listed.
    */
  final case class ZorderSpec(dims: Seq[String], bits: Int = 8, bucketBits: Int = 4)

  /** One committed (partition, generation)'s envelope: each z dimension's
    * min/max over the generation's rows. */
  private[graft] final case class ZEnv(part: Int, gen: Long, lo: Seq[Long], hi: Seq[Long])

  /** The Z-layout sidecar committed beside a manifest: the spec, the
    * quantization plan (so an external reader can replay bucket
    * assignment), and every written generation's envelope. Bounded:
    * ≤ parts × 2^bucketBits envelope rows.
    */
  private[graft] final case class ZMap(
      spec: ZorderSpec, plan: Seq[graft.ops.Layout.DimSpec], envs: Seq[ZEnv]) {
    def gensFor(p: Int): Set[Long] = envs.iterator.filter(_.part == p).map(_.gen).toSet
    def envIntersects(e: ZEnv, box: Seq[(Long, Long)]): Boolean =
      box.indices.forall(d => e.hi(d) >= box(d)._1 && e.lo(d) <= box(d)._2)
  }

  private def zmapPath(loc: Path, v: Long) = new Path(loc, s"_zmap-$v.txt")

  private def renderZmap(z: ZMap): String = {
    val head = Seq(
      s"dims:${z.spec.dims.mkString(",")}",
      s"bits:${z.spec.bits}",
      s"bucketBits:${z.spec.bucketBits}",
      s"plan:${z.plan.map(p => s"${p.name},${p.min},${p.shift}").mkString("|")}")
    val envs = z.envs.map(e =>
      s"env:${e.part}:${e.gen}:${e.lo.zip(e.hi).map { case (a, b) => s"$a,$b" }.mkString(";")}")
    (head ++ envs).mkString("\n")
  }

  private def parseZmap(s: String): ZMap = {
    val lines = s.split("\n").map(_.trim).filter(_.nonEmpty)
    def field(k: String): String =
      lines.find(_.startsWith(s"$k:")).map(_.stripPrefix(s"$k:"))
        .getOrElse(sys.error(s"zmap sidecar missing field $k"))
    val dims = field("dims").split(",").toSeq
    val plan = field("plan").split("\\|").toSeq.map { p =>
      val Array(n, mn, sh) = p.split(",")
      graft.ops.Layout.DimSpec(n, mn.toLong, sh.toInt)
    }
    val envs = lines.filter(_.startsWith("env:")).toSeq.map { l =>
      val Array(_, p, g, ranges) = l.split(":", 4)
      val bounds = ranges.split(";").toSeq.map { r =>
        val Array(a, b) = r.split(","); (a.toLong, b.toLong)
      }
      ZEnv(p.toInt, g.toLong, bounds.map(_._1), bounds.map(_._2))
    }
    ZMap(ZorderSpec(dims, field("bits").toInt, field("bucketBits").toInt), plan, envs)
  }

  /** The newest committed Z-layout sidecar, if any. A sidecar is only
    * TRUSTED per-partition: readers check that a partition's live
    * generations are a subset of the sidecar's generations for it (a
    * later delta or a plain compaction invalidates the partition, and the
    * reader falls back to the full merge-on-read scan — correctness never
    * depends on the sidecar being current). An UNPARSEABLE sidecar
    * resolves to None for the same reason: pruning is an accelerator,
    * never a correctness dependency, so a corrupt file must degrade to
    * the exact path, not poison every read (code-review r13 #2b; the
    * write side is tmp+renamed, so this guards external damage, not the
    * engine's own commits).
    */
  private[graft] def readZmap(spark: SparkSession, name: String): Option[ZMap] = {
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val vers =
      if (!fs.exists(loc)) Seq.empty
      else fs.listStatus(loc).toSeq.map(_.getPath.getName)
        .collect { case ZmapRe(n) => n.toLong }.sorted
    vers.lastOption.flatMap { v =>
      try Some(parseZmap(readText(fs, zmapPath(loc, v))))
      catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Partitions whose live generations all came from one z-compaction:
    * key-disjoint, so the merge rank is skippable. */
  private def disjointIn(z: ZMap, manifest: Manifest): Set[Int] =
    manifest.collect {
      case (p, gens) if gens.size > 1 && gens.toSet.subsetOf(z.gensFor(p)) => p
    }.toSet

  private def zDisjointParts(
      spark: SparkSession, name: String, manifest: Manifest): Set[Int] =
    // single-generation-everywhere tables (bulk-written, plainly
    // compacted — the common case) take no rank anyway, so skip the
    // sidecar's extra directory listing entirely (code-review r13 #6)
    if (manifest.forall(_._2.size <= 1)) Set.empty
    else readZmap(spark, name).map(disjointIn(_, manifest)).getOrElse(Set.empty)

  /** The shared box-admission computation behind [[readBox]] and
    * [[boxGenCounts]] (one sidecar read, one manifest read, one admission
    * pass): `(zmap, live manifest, admitted manifest)` — a clean
    * partition keeps only envelope-intersecting generations, a partition
    * mutated since the layout keeps its full chain (exactness first).
    */
  private def boxAdmission(
      spark: SparkSession, name: String,
      box: Seq[(Long, Long)]): (ZMap, Manifest, Manifest) = {
    val z = readZmap(spark, name).getOrElse(sys.error(
      s"$name has no Z-order layout — run compact(zorder = Some(ZorderSpec(dims))) first"))
    require(box.size == z.spec.dims.size,
      s"one (lo, hi) bound per z dimension: ${z.spec.dims.mkString(", ")}")
    val manifest = readManifest(spark, name).map(_._2).getOrElse(Map.empty)
    val admitted: Manifest = manifest.flatMap { case (p, gens) =>
      val pruned =
        if (gens.toSet.subsetOf(z.gensFor(p)))
          gens.filter(g =>
            z.envs.exists(e => e.part == p && e.gen == g && z.envIntersects(e, box)))
        else gens
      if (pruned.isEmpty) None else Some(p -> pruned)
    }
    (z, manifest, admitted)
  }

  // ------------------------------------------------------- gen allocation

  /** Allocate the next generation id and stamp an `_intent-G` marker
    * BEFORE any data is written. The marker is what makes crashed
    * attempts harmless: a later writer's allocation scans committed gens
    * AND intents, so an orphan generation's id is never reused (reusing
    * it would mix two attempts' files in one `__g` dir — the one way an
    * append-only layout could corrupt).
    */
  private def allocateGen(fs: FileSystem, loc: Path, manifest: Manifest): Long =
    allocateGenRange(fs, loc, manifest, 1)

  /** Allocate `count` CONSECUTIVE generation ids (a Z-ordered compaction
    * commits one generation per Z-prefix bucket) — every id in the range
    * gets its intent marker, so a crashed attempt poisons none of them
    * for reuse.
    */
  /** IN-FLIGHT generation registry (r19 — VERDICT r18 next #2): the ids
    * this JVM's writers have allocated but not yet committed, keyed by
    * qualified table location. Vacuum must never reclaim another LIVE
    * writer's staging dirs, renamed-but-uncommitted generation dirs, or
    * intent markers — under the r18 single-writer contract "a stage in
    * flight during vacuum" was impossible, but optimistic concurrent
    * commits make it the normal case. Process-local on purpose: the
    * optimistic-commit contract is per-JVM (partition-disjoint writer
    * THREADS on one table — the parallel-backfill shape); CROSS-process
    * concurrent writers keep the single-writer-per-table contract — the
    * manifest CAS still race-detects their commits, but each process's
    * vacuum would treat the other's in-flight staging as crash debris.
    */
  private val inFlightGens = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[Long, Manifest]]

  private def inFlightKey(fs: FileSystem, loc: Path): String =
    fs.makeQualified(loc).toString

  private def inFlightFor(fs: FileSystem, loc: Path)
      : java.util.concurrent.ConcurrentHashMap[Long, Manifest] =
    inFlightGens.computeIfAbsent(inFlightKey(fs, loc),
      _ => new java.util.concurrent.ConcurrentHashMap[Long, Manifest])

  private def liveGenSet(fs: FileSystem, loc: Path): java.util.Set[Long] = {
    val m = inFlightGens.get(inFlightKey(fs, loc))
    if (m == null) java.util.Collections.emptySet[Long]()
    else new java.util.HashSet[Long](m.keySet)
  }

  private def releaseGens(fs: FileSystem, loc: Path, gens: Seq[Long]): Unit = {
    val s = inFlightGens.get(inFlightKey(fs, loc))
    if (s != null) gens.foreach(s.remove)
    ()
  }

  private def allocateGenRange(
      fs: FileSystem, loc: Path, manifest: Manifest, count: Int): Long = {
    def currentCommittedMax(): Long =
      manifestVersions(fs, loc).lastOption
        .map(v => parseManifest(readText(fs, manifestPath(loc, v)))
          .valuesIterator.flatten.foldLeft(-1L)(math.max))
        .getOrElse(-1L)
    var attempts = 0
    while (attempts < 32) {
      // committedMax from the CURRENT manifest, not the caller's stage
      // snapshot: a concurrent writer may have committed (and vacuumed
      // the retired intent of) a higher gen since the caller's read
      val committedMax = currentCommittedMax()
      val intentMax =
        if (!fs.exists(loc)) -1L
        else fs.listStatus(loc).toSeq.map(_.getPath.getName)
          .collect { case IntentRe(n) => n.toLong }.foldLeft(-1L)(math.max)
      val base = math.max(committedMax, intentMax) + 1L
      // ATOMIC claim (r19): the bare create(overwrite = false) decomposes
      // into exists-then-create on a local FS, so two racing writers
      // could claim the same id; exclusiveCreate is the same CAS
      // primitive the manifest lock uses. A partial range claim that
      // loses a later id simply rescans — its claimed intents poison
      // those ids (never reused) and retire via vacuum like any crashed
      // attempt's.
      try {
        (0 until count).foreach(i =>
          exclusiveCreate(fs, new Path(loc, s"_intent-${base + i}")))
        // register with the ALLOCATION-TIME manifest snapshot: the
        // commit's conflict check compares each touched partition's gen
        // list against this base — a concurrent commit to the same
        // partitions between stage and commit is the lost-update shape
        // and refuses; disjoint interleaved commits rebase. Register
        // BEFORE the staleness re-check so a concurrent vacuum cannot
        // treat the fresh claims as retired debris in the gap.
        (0 until count).foreach(i => inFlightFor(fs, loc).put(base + i, manifest))
        // CLOSE THE REUSE RACE (code-review r19): between this writer's
        // base scan and its claim, a racer may have COMMITTED a gen >=
        // base and its commit-side vacuum retired that gen's intent —
        // the claim then "succeeds" on an id that is already committed
        // data. Re-check against the now-current manifest: a stale base
        // releases its claims (registry first, then the markers — no
        // window where the markers are unprotected-but-present) and
        // rescans past the new committed max. After a VALID claim no
        // racer can commit these ids (committing requires holding the
        // intent, which exclusiveCreate now denies them).
        if (base <= currentCommittedMax()) {
          releaseGens(fs, loc, (0 until count).map(base + _))
          (0 until count).foreach(i =>
            fs.delete(new Path(loc, s"_intent-${base + i}"), false))
          attempts += 1
        } else return base
      } catch {
        case _: java.io.IOException => attempts += 1 // lost a claim; rescan
      }
    }
    sys.error(s"could not allocate a generation id under $loc after 32 attempts " +
      "— writer contention is pathological or intent markers cannot be created")
  }

  /** Reclaim everything no live reader can need: manifests older than the
    * retention window (default the last two), generation dirs referenced
    * by NO kept manifest whose id is below the newest committed
    * generation (orphans of crashed attempts and compacted-away deltas),
    * and stale intent markers. Runs inside the writer's commit
    * (single-writer contract), after the new manifest is live — the
    * previous manifest is retained so a reader that resolved it mid-scan
    * keeps finding its files (the ANN index's last-2 retention rule).
    * `retain` > 2 widens the TIME-TRAVEL window ([[setRetention]] —
    * VERDICT r13 #6): every kept manifest stays [[readVersion]]-readable
    * because its referenced generations are kept with it.
    *
    * Returns the `(partition, generation)` dirs it deleted, so the
    * caller can DEREGISTER their catalog partition entries
    * ([[vacuumAndDeregister]], r17): the metastore otherwise keeps one
    * partition row per (partition, generation) EVER committed — for a
    * long-running stream that is one dead entry per touched partition
    * per trigger, forever, bloating the metastore and every
    * partition-pruned plan's catalog call with entries whose
    * directories no longer exist.
    */
  private def vacuum(fs: FileSystem, loc: Path, retain: Int = 2): Seq[(Int, Long)] = {
    // another writer's allocated-but-uncommitted generations (r19):
    // their staging dirs, renamed gen dirs, and intent markers are NOT
    // debris — skip them everywhere below
    val live = liveGenSet(fs, loc)
    val vers = manifestVersions(fs, loc)
    vers.dropRight(retain).foreach { v =>
      fs.delete(manifestPath(loc, v), false)
      // the commit lock retires with its manifest (same retention);
      // a straggler re-claiming a vacuumed version's lock is caught by
      // writeManifest's post-lock currency check
      fs.delete(new Path(loc, s"_manifest-$v.lock"), false)
    }
    // z-layout sidecars older than the NEWEST one retire once their
    // manifest does: readers only ever consult the latest sidecar, and
    // its per-partition subset check makes a stale sidecar harmless, so
    // retention here is disk hygiene, not correctness
    val zvers = fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .collect { case ZmapRe(n) => n.toLong }.sorted
    zvers.dropRight(1).filter(zv => !vers.takeRight(retain).contains(zv))
      .foreach(zv => fs.delete(zmapPath(loc, zv), false))
    val kept = vers.takeRight(retain)
      .map(v => parseManifest(readText(fs, manifestPath(loc, v))))
    if (kept.isEmpty) return Seq.empty
    val referenced: Map[Int, Set[Long]] = kept.flatten
      .groupBy(_._1).map { case (p, gs) => p -> gs.flatMap(_._2).toSet }
    val maxCommitted = kept.last.valuesIterator.flatten.foldLeft(-1L)(math.max)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    fs.listStatus(loc).toSeq.filter(_.isDirectory).foreach { d =>
      val dn = d.getPath.getName
      if (dn.startsWith(s"$PartCol=")) {
        val p = dn.stripPrefix(s"$PartCol=").toInt
        fs.listStatus(d.getPath).toSeq.filter(_.isDirectory).foreach { gd =>
          val gn = gd.getPath.getName
          if (gn.startsWith(s"$GenCol=")) {
            val g = gn.stripPrefix(s"$GenCol=").toLong
            if (g < maxCommitted && !live.contains(g) &&
              !referenced.getOrElse(p, Set.empty).contains(g)) {
              fs.delete(gd.getPath, true)
              deleted += ((p, g))
            }
          }
        }
      }
    }
    // intents at or below the committed high-water mark no longer guard
    // anything (allocation already clears that mark via the manifest) —
    // unless their gen is another writer's in-flight allocation, which
    // can sit below a faster writer's committed max
    fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .collect { case n @ IntentRe(g)
        if g.toLong <= maxCommitted && !live.contains(g.toLong) => n }
      .foreach(n => fs.delete(new Path(loc, n), false))
    deleted.toSeq
  }

  /** [[vacuum]] + catalog-partition deregistration (r17): every write
    * path's maintenance step. The data files are already gone when the
    * drop runs, so `retainData = true` (nothing left to purge) and
    * `ignoreIfNotExists = true` (a generation written by a crashed
    * attempt may have files on disk but no catalog entry — its dir is
    * vacuumed like any orphan and the drop must not fail on the
    * missing registration).
    */
  private def vacuumAndDeregister(
      spark: SparkSession, name: String, fs: FileSystem, loc: Path): Unit = {
    // orphaned staging dirs (a writer crashed mid-stage; r18): sweepable
    // because no LIVE stage can be in flight for them — under r19's
    // optimistic concurrency that is no longer "any stage dir" but "any
    // stage dir whose gen is not another in-JVM writer's in-flight
    // allocation" (the registry above; a replayed trigger never reuses a
    // crashed gen id, so what is left really is dead weight)
    val liveStages = liveGenSet(fs, loc)
    fs.listStatus(loc).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("_stage-") &&
        !scala.util.Try(n.stripPrefix("_stage-").toLong).toOption
          .exists(liveStages.contains))
        fs.delete(st.getPath, true)
    }
    val dead = vacuum(fs, loc, retainOf(spark, name))
    if (dead.nonEmpty) {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
      spark.sessionState.catalog.dropPartitions(
        ident,
        dead.map { case (p, g) =>
          Map(PartCol -> p.toString, GenCol -> g.toString)
        },
        ignoreIfNotExists = true, purge = false, retainData = true)
    }
  }

  // ------------------------------------------------------------ public API

  /** S6: declare + create an empty managed table with an explicit schema.
    * Errors if an incompatible table already exists (ES `indices.create`
    * semantics without the ignore-400 of the reference).
    */
  def createTable(spark: SparkSession, name: String, schema: StructType): Unit = {
    spark.catalog.createTable(name, "parquet", schema, Map.empty[String, String])
    invalidateRefresh(name) // fresh identity for every session
    ()
  }

  /** Schema check mirroring the declared-mapping guarantee: names+types of
    * the frame must match the declared schema (order- and nullability-
    * insensitive — catalogString compares the type shape only).
    */
  def conforms(df: DataFrame, declared: StructType): Boolean = {
    val have = df.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
    declared.fields.forall(f => have.get(f.name).contains(f.dataType.catalogString)) &&
      have.size == declared.size
  }

  /** S7: bulk write, distributed and idempotent (overwrite = the batch
    * snapshot semantics of an offline rebuild). Lays the table out in the
    * generational layout (see object doc) with the whole frame as
    * generation 0, and commits manifest 0 — at 100 TB this pairing is
    * what replaces inverted-index routing: lookups prune to one bucket,
    * upserts append only their batch.
    */
  def bulkWrite(
      df: DataFrame, name: String, idCol: String,
      declared: Option[StructType] = None, buckets: Int = 16,
      parts: Int = DefaultParts, validateKeys: Boolean = false,
      meta: ManifestMeta = Map.empty): Unit = {
    declared.foreach { s =>
      require(conforms(df, s), s"schema does not conform to declared mapping for $name")
    }
    // TWO usage classes share this writer. ROUTED tables (the posting
    // index keyed by variant, the serving tables keyed by userId/movieId
    // with k rows per key) bulk-write non-unique ids on purpose — the id
    // only buckets/prunes, and the table is rebuilt offline, never
    // upserted. KEYED tables (dedup/novelty indexes, counts, documents)
    // will take upserts/deletes, and the merge-on-read rank ASSUMES
    // per-generation key uniqueness: a duplicated gen-0 key reads fine
    // until its partition gains a delta, then the rank ties within gen 0
    // and an ARBITRARY copy survives (r12 review). `validateKeys = true`
    // enforces the keyed-class contract at build time with one extra
    // aggregate pass.
    if (validateKeys) {
      val bad = df.groupBy(idCol).count()
        .filter(col("count") > 1 || col(idCol).isNull).limit(1).count()
      require(bad == 0L, s"bulk write for $name contains duplicate or NULL $idCol keys")
    }
    // Overwrite = offline rebuild, which must also survive a STALE location:
    // the session catalog here is in-memory (no persistent metastore), so a
    // prior JVM's table data can sit in the warehouse dir with no catalog
    // entry — saveAsTable would refuse with LOCATION_ALREADY_EXISTS. The
    // catalog computes the location (honoring the CURRENT database — a
    // hand-built <warehouse>/<name> path would be wrong after USE db, and
    // deleting a wrong path is worse than failing).
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val loc = new Path(spark.sessionState.catalog.defaultTablePath(ident))
    val fs = fsFor(spark, loc)
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition on the id with the bucket count: HashPartitioning(id, n)
    // is exactly the bucket-assignment function, so every task holds ONE
    // bucket's rows and writes one file per partition dir it touches.
    // Without this, a bucketed write emits a file per (task × dir × bucket)
    // — the classic small-files blowup (measured: 3,600 rows → ~3,600
    // files), which is also wrong at 100 TB where the commit protocol
    // renames every one of them.
    withPart(df.withColumn(DelCol, lit(false)), idCol, parts)
      .withColumn(GenCol, lit(0L))
      .repartition(buckets, col(idCol)).write
      .mode(SaveMode.Overwrite)
      .partitionBy(PartCol, GenCol)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .saveAsTable(name)
    val qname = spark.sessionState.sqlParser.parseTableIdentifier(name).quotedString
    spark.sql(s"ALTER TABLE $qname SET TBLPROPERTIES " +
      s"('$PartsProp' = '$parts', '$IdColProp' = '$idCol')")
    invalidateRefresh(name) // rebuild = new table identity for every session
    // manifest 0: every partition dir the write produced carries gen 0
    val present = fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$PartCol=") => n.stripPrefix(s"$PartCol=").toInt }
    writeManifest(fs, loc, 0L, present.map(_ -> Seq(0L)).toMap, meta)
  }

  /** Read a store table: resolve the latest manifest, scan only live
    * `(partition, generation)` dirs, and for partitions carrying a delta
    * chain keep the newest generation's row per key. Single-generation
    * partitions (a bulk-written or freshly compacted table) take a plain
    * pruned scan with no merge rank at all, so the bucketed point-lookup
    * and co-located-join plans are identical to a non-generational table
    * (StoreSpec/PlanSpec pin both). Reads always re-resolve (refresh +
    * manifest) so a scan never trusts a stale file listing.
    */
  def read(spark: SparkSession, name: String): DataFrame = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    val t = spark.table(name)
    if (!t.columns.contains(GenCol)) return t.drop(PartCol) // flat / legacy
    val manifest = readManifest(spark, name).map(_._2).getOrElse(Map.empty)
    readAt(spark, name, manifest, zDisjointParts(spark, name, manifest))
  }

  /** Committed manifest versions still on disk, oldest first — the
    * TIME-TRAVEL window. Retention keeps the last two (the current table
    * and its predecessor), so `versions.init` are the readable past
    * states; older versions are vacuumed, not archived.
    */
  def versions(spark: SparkSession, name: String): Seq[Long] = {
    requireTable(spark, name)
    flushPending(spark, name) // versions is a READ of the commit history
    val loc = tableLocation(spark, name)
    manifestVersions(fsFor(spark, loc), loc)
  }

  /** TIME-TRAVEL read: the table exactly as manifest `version` committed
    * it. Free by construction — data files are immutable and a manifest
    * IS a snapshot, so reading the past is just resolving an older
    * manifest (the same trick Iceberg/Delta snapshots rest on). Only
    * versions inside the retention window are readable ([[versions]]);
    * asking for a vacuumed one fails loudly rather than returning a
    * partially-reclaimed table.
    */
  def readVersion(spark: SparkSession, name: String, version: Long): DataFrame = {
    requireTable(spark, name)
    flushPending(spark, name) // a time-travel read must see the group's commits
    refreshIfMoved(spark, name)
    require(spark.table(name).columns.contains(GenCol),
      s"$name is not a generational store table — no versions to read")
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val have = manifestVersions(fs, loc)
    require(have.contains(version),
      s"version $version of $name is outside the retention window (have: ${have.mkString(",")})")
    val base = readAt(spark, name, parseManifest(readText(fs, manifestPath(loc, version))))
    // time travel returns the SHAPE that version served: project to the
    // newest schema sidecar at or before it (absent for never-evolved
    // tables → the current columns are the forever columns)
    schemaVersions(fs, loc).filter(_ <= version).lastOption match {
      case Some(sv) =>
        val cols = readText(fs, schemaPath(loc, sv))
          .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        base.select(cols.map(col(_)): _*)
      case None => base
    }
  }

  /** Partition- AND bucket-pruned POINT READ — the ES `get(id=...)` /
    * routed-term-query analog, and the read path that makes the store a
    * serving table at 100 TB: the key's routing partition is computed
    * DRIVER-SIDE by evaluating the very same Catalyst expressions the
    * write path partitioned with (`pmod(hash(id), parts)`, seed-fixed
    * murmur3 — reimplementing the hash here is how key→partition drift
    * bugs are born), the manifest is narrowed to just those partitions'
    * live generations, and the id filter then bucket-prunes within each
    * partition dir (the table is bucketed on the id). Net scan: the keys'
    * partition dirs × one bucket file each — independent of table size.
    * The merge-on-read rank still applies where a looked-up partition
    * carries a delta chain, so a lookup sees exactly what [[read]] sees
    * (StoreSpec pins hash-equality; PlanSpec pins the pruning).
    */
  def lookup(spark: SparkSession, name: String, keys: Seq[Any]): DataFrame = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    val t = spark.table(name)
    // generational-layout check FIRST: a flat table (createTable + legacy
    // upsert) records no id column, so idColOf would throw before any
    // later branch could run — fail with the actionable message instead
    require(t.columns.contains(GenCol),
      s"$name is not a generational store table — lookup needs the routed " +
        "layout (rebuild via bulkWrite); filter a plain read instead")
    val idCol = idColOf(spark, name)
    if (keys.isEmpty) return readAt(spark, name, Map.empty)
    val parts = partsOf(spark, name)
    // widen each key to the id column's exact type BEFORE hashing — murmur3
    // of Int 7 and Long 7 differ, and the table partitioned on the column
    val idType = t.schema(idCol).dataType
    val keyParts: Set[Int] = keys.map { k =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash, Pmod}
      Pmod(new Murmur3Hash(Seq(Cast(Literal(k), idType))), Literal(parts))
        .eval(null).asInstanceOf[Int]
    }.toSet
    val manifest = readManifest(spark, name).map(_._2).getOrElse(Map.empty)
    readAt(spark, name, manifest.view.filterKeys(keyParts).toMap)
      .filter(col(idCol).isin(keys.map(k => lit(k).cast(idType)): _*))
  }

  /** [[lookup]]'s sibling for a key set that lives in a FRAME, not in
    * driver literals (a micro-batch's endpoint ids, a join's probe side):
    * the keys' routing partitions are computed with the write path's own
    * expressions in ONE tiny distributed aggregate (the collect is ≤
    * `parts` ints — partition NUMBERS, never keys, so the driver bound
    * holds at any batch size), the manifest narrows to those partitions'
    * live generations, and the scan lists only their dirs. The caller
    * joins the result against its key frame (this returns the touched
    * partitions' FULL rows — per-key bucket pruning needs literal keys,
    * which is exactly what this variant exists to avoid). Net scan:
    * min(|keys|, parts) partition dirs — for a micro-batch against a
    * large table, a small fraction of it; degrades gracefully to [[read]]
    * when the key set spans every partition.
    */
  def readForKeys(spark: SparkSession, name: String, keys: DataFrame): DataFrame = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    val t = spark.table(name)
    require(t.columns.contains(GenCol),
      s"$name is not a generational store table — readForKeys needs the " +
        "routed layout (rebuild via bulkWrite); filter a plain read instead")
    val idCol = idColOf(spark, name)
    val parts = partsOf(spark, name)
    val idType = t.schema(idCol).dataType
    val kc = keys.columns.head
    // LOCAL key frames (r17 — the applyBatch fast path's endpoint set)
    // route driver-side with the write path's own expressions, zero
    // jobs; distributed frames keep the ≤`parts`-int aggregate
    val touched = localRelationOf(keys.select(col(kc))) match {
      case Some(l) =>
        val route = partEvaluator(l.output.head.dataType, idType, parts)
        l.data.map(r => route(r.get(0, l.output.head.dataType))).toSet
      case None =>
        keys.select(pmod(hash(keys(kc).cast(idType)), lit(parts)).as("__p"))
          .distinct().collect().map(_.getInt(0)).toSet
    }
    val manifest = readManifest(spark, name).map(_._2).getOrElse(Map.empty)
    readAt(spark, name, manifest.view.filterKeys(touched).toMap)
  }

  /** [[readForKeys]] trimmed to exactly the probe keys — the
    * index-probe shape every per-trigger streaming lookup needs
    * (the [[graft.ops.Components.applyBatch]] pattern, factored out):
    * prune the scan to the keys' routing partitions, then semi-join
    * away the co-resident rows for OTHER keys, so downstream joins run
    * batch×batch instead of batch×partition. `keyCol` must be the
    * table's key column (the semi-join runs on it). Net cost per call:
    * one ≤`parts`-int collect + min(|keys|, parts) partition dirs
    * scanned — independent of table size, which is what turns a
    * streaming sink's per-trigger index read from O(corpus) to
    * O(batch) (StreamIndexPruneSpec pins the bytes-read invariance).
    */
  def probe(spark: SparkSession, name: String, keys: DataFrame,
      keyCol: String): DataFrame = {
    val k = keys.select(col(keyCol))
    readForKeys(spark, name, k).join(k, Seq(keyCol), "left_semi")
  }

  /** ENVELOPE-PRUNED BOX READ over a Z-ordered store table (r12 verdict
    * #2 — the natural join of the generational store and the
    * [[graft.ops.Layout]] machinery): after `compact(zorder = ...)`, each
    * partition's rows live in one generation per Z-prefix bucket, and the
    * sidecar records every generation's per-dimension envelope. A box
    * query then prunes DRIVER-SIDE — admit only generations whose
    * envelope intersects the box — so the scan lists exactly the
    * intersecting `(partition, generation)` dirs, with the residual
    * per-dim filters keeping exactness (an admitted generation still
    * holds rows outside the box).
    *
    * Partitions mutated SINCE the z-compaction (a later delta chain, or
    * never z-compacted) fall back to their full merge-on-read chain plus
    * the residual filter — the sidecar is a pruning accelerator, never a
    * correctness dependency. Box bounds align with the sidecar's dims,
    * in order ([[zmapDims]]).
    */
  def readBox(
      spark: SparkSession, name: String, box: Seq[(Long, Long)]): DataFrame = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    val (z, _, admitted) = boxAdmission(spark, name, box)
    val base = readAt(spark, name, admitted, disjointIn(z, admitted))
    z.spec.dims.zip(box).foldLeft(base) { case (df, (d, (lo, hi))) =>
      df.filter(col(d) >= lo && col(d) <= hi)
    }
  }

  /** The sidecar's dimension order — what [[readBox]]'s bounds align to. */
  def zmapDims(spark: SparkSession, name: String): Seq[String] = {
    requireTable(spark, name)
    readZmap(spark, name).map(_.spec.dims).getOrElse(Seq.empty)
  }

  /** Pruning accounting for a box over the current manifest: (admitted
    * live generations, total live generations) — what a gate/spec asserts
    * shrank. Driver-side only, no Spark job.
    */
  private[graft] def boxGenCounts(
      spark: SparkSession, name: String, box: Seq[(Long, Long)]): (Int, Int) = {
    val (_, manifest, admitted) = boxAdmission(spark, name, box)
    (admitted.valuesIterator.map(_.size).sum, manifest.valuesIterator.map(_.size).sum)
  }

  /** CHANGELOG (CDC) between two RETAINED versions: every key whose value
    * differs between the `fromVersion` and `toVersion` snapshots, labeled
    * `insert` / `update` / `delete`, carrying the POST-image columns
    * (null for deletes). The downstream-sync primitive a 100 TB corpus
    * store needs — a consumer mirrors the table by applying the
    * changelog, never by re-reading the table.
    *
    * MANIFEST-PRUNED: a partition whose live-generation list is identical
    * in both manifests cannot hold a change (data files are immutable),
    * so only differing partitions are scanned and diffed — the cost of a
    * changelog is proportional to what the window's commits touched, not
    * to the table. The diff itself is VALUE-based (full-outer join on the
    * key, null-safe struct compare), so a compaction commit — which
    * rewrites manifests without changing logical content — yields an
    * empty changelog, as it must.
    */
  def changes(
      spark: SparkSession, name: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    requireTable(spark, name)
    flushPending(spark, name) // the changelog must see the group's commits
    refreshIfMoved(spark, name)
    require(spark.table(name).columns.contains(GenCol),
      s"$name is not a generational store table — no versions to diff")
    require(fromVersion <= toVersion,
      s"changelog window is inverted: from=$fromVersion > to=$toVersion")
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val have = manifestVersions(fs, loc)
    Seq(fromVersion, toVersion).foreach(v => require(have.contains(v),
      s"version $v of $name is outside the retention window (have: ${have.mkString(",")})"))
    val mFrom = parseManifest(readText(fs, manifestPath(loc, fromVersion)))
    val mTo = parseManifest(readText(fs, manifestPath(loc, toVersion)))
    val changedParts = (mFrom.keySet ++ mTo.keySet)
      .filter(p => mFrom.get(p) != mTo.get(p))
    val idCol = idColOf(spark, name)
    val valCols = spark.table(name).columns
      .filterNot(c => c == PartCol || c == GenCol || c == DelCol || c == idCol)
    // a key-only table still diffs (insert/delete only — nothing to update)
    val image: Column =
      if (valCols.isEmpty) lit(0) else struct(valCols.map(col(_)): _*)
    def snap(m: Manifest, as: String): DataFrame =
      readAt(spark, name, m.view.filterKeys(changedParts).toMap)
        .select(col(idCol), image.as(as))
    val diff = snap(mFrom, "__pre").join(snap(mTo, "__post"), Seq(idCol), "full_outer")
      .withColumn("change_type",
        when(col("__pre").isNull && col("__post").isNotNull, lit("insert"))
          .when(col("__post").isNull && col("__pre").isNotNull, lit("delete"))
          .when(!(col("__pre") <=> col("__post")), lit("update")))
      .filter(col("change_type").isNotNull)
    diff.select(
      col(idCol) +: col("change_type") +:
        valCols.map(c => col(s"__post.$c").as(c)): _*)
  }

  /** `disjointParts`: partitions PROVEN key-disjoint across their live
    * generations (one z-compaction wrote them all — [[zDisjointParts]]).
    * They take the plain pruned scan even with >1 generation: the merge
    * rank would keep every row anyway, and skipping it removes the
    * windowed exchange from every read of a z-compacted table.
    */
  private def readAt(
      spark: SparkSession, name: String, manifest: Manifest,
      disjointParts: Set[Int] = Set.empty): DataFrame = {
    val t = spark.table(name)
    if (manifest.isEmpty) {
      val empty = t.filter(lit(false))
      return (if (empty.columns.contains(DelCol)) empty.drop(DelCol) else empty)
        .drop(PartCol, GenCol)
    }
    // group partitions sharing a generation list into ONE clause
    // (r17): the naive per-partition disjunction grows to parts ×
    // chain-length leaves, which the Hive metastore's direct-SQL
    // partition pruning expands past Derby's statement limits on a
    // local bench (it then falls back to a client-side prune — an
    // exception + full-metadata round trip per read). Upsert-built
    // tables mostly share one gen list across touched partitions, so
    // the grouped form is a handful of clauses — same (part, gen)
    // admission set, metastore-pushable again
    def liveCond(m: Manifest): Column = m.toSeq
      .groupBy(_._2.sorted).toSeq
      .map { case (gs, pgs) =>
        val ps = pgs.map(_._1)
        val pc =
          if (ps.size == 1) col(PartCol) === ps.head
          else col(PartCol).isin(ps: _*)
        pc && col(GenCol).isin(gs: _*)
      }.reduce(_ || _)
    val (multi, single) = manifest.partition {
      case (p, gs) => gs.size > 1 && !disjointParts.contains(p)
    }
    // a tombstone surviving as its key's newest version deletes the key
    // (pre-tombstone layouts lack the column and skip the filter)
    def finish(df: DataFrame): DataFrame = {
      val undeleted = if (df.columns.contains(DelCol)) df.filter(!col(DelCol)) else df
      undeleted.drop(PartCol, GenCol, DelCol)
    }
    val plain =
      if (single.isEmpty) None
      else Some(finish(t.filter(liveCond(single))))
    val merged =
      if (multi.isEmpty) None
      else {
        // newest generation wins per key; ids are unique within a
        // generation (upsert validates batches, gen 0/compaction fold by
        // construction), so the rank is deterministic
        val w = Window.partitionBy(col(idColOf(spark, name))).orderBy(col(GenCol).desc)
        Some(finish(t.filter(liveCond(multi))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")))
      }
    (plain, merged) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => finish(t.filter(lit(false)))
    }
  }

  /** Keyed upsert (the actual ES `index(id=...)` semantics): rows in
    * `updates` replace same-key rows in the table, new keys append.
    * APPEND-ONLY DELTA: the batch is validated (unique, non-null keys —
    * duplicate update keys have no defined winner, and a NULL key can
    * never be replaced: SQL joins don't match NULLs, ES likewise rejects
    * a null `_id`), written as a new generation covering only the
    * partitions its keys hash to, and made live by the atomic manifest
    * commit. Nothing existing is read, rewritten, or deleted — the cost
    * of an upsert is O(batch), and a crash at ANY point before the
    * manifest rename leaves the table exactly as it was (the staged
    * generation is unreferenced and later vacuumed).
    *
    * Replaced row versions linger in older generations until [[compact]]
    * folds the chain — the merge-on-read rank in [[read]] hides them.
    * Single-writer per table (manifest counter), as the object doc says.
    */
  def upsert(spark: SparkSession, name: String, updates: DataFrame, idCol: String,
      buckets: Int = 16, metaUpdates: ManifestMeta = Map.empty): Unit = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    // DEPRECATED FALLBACK — a table without the generational layout
    // (created by createTable, or any externally-made flat table) still
    // upserts correctly, but pays a FULL-TABLE copy-on-write per batch:
    // there is no partition/generation structure to scope the write to,
    // so the cost is O(table), not O(batch). At scale every upserted
    // table should be built via bulkWrite (generational layout); this
    // branch exists only so declared-schema createTable tables keep
    // working, and will not grow features (no tombstones, no time
    // travel, no changelog).
    if (!spark.table(name).columns.contains(GenCol)) {
      // validate BEFORE the merge commits anything: a post-write throw
      // would break the atomic watermark+data contract the meta API
      // advertises (code-review r19)
      require(metaUpdates.isEmpty,
        s"$name is a flat table — manifest meta needs the generational layout")
      val badKeys = updates.groupBy(idCol).count()
        .filter(col("count") > 1 || col(idCol).isNull).limit(1).count()
      require(badKeys == 0L, s"updates contain duplicate or NULL $idCol keys")
      val merged = spark.table(name)
        .join(updates.select(col(idCol)), Seq(idCol), "left_anti")
        .unionByName(updates)
        .select(spark.table(name).columns.map(col(_)): _*)
        .localCheckpoint()
      merged.write.mode(SaveMode.Overwrite).insertInto(name)
      forceRefresh(spark, name)
      return
    }
    stageAndCommitDelta(spark, name, updates, idCol, buckets, metaUpdates)
  }

  /** The upsert's two halves, separable so StoreSpec can simulate a crash
    * between them: [[stageDelta]] writes the batch as an uncommitted
    * generation (invisible to readers), [[commitDelta]] makes it live.
    */
  private[graft] def stageDelta(
      spark: SparkSession, name: String, updates: DataFrame, idCol: String,
      buckets: Int): Option[(Long, Seq[Int])] = {
    // additive widening first (schema-level, no data moves) so the staged
    // select below resolves against the evolved column order
    evolveForUpdates(spark, name, updates)
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    // RAW read: staging must not force a same-table commit-group flush
    // (allocation is intent-monotone past pending gens)
    val manifest = readManifestRaw(spark, name).map(_._2).getOrElse(
      sys.error(s"generational store table $name has no manifest — rebuild via bulkWrite"))
    val parts = partsOf(spark, name)
    val u = withPart(updates, idCol, parts)
    // ONE job over the batch computes the key validation AND the
    // touched-partition list (at most `parts` small integers — a
    // driver-side value list that names the partitions the manifest entry
    // extends). These were two separate jobs until r8; per-micro-batch
    // upserts pay the fixed job cost 4× per trigger. A LOCAL update
    // frame (r17 — the applyBatch fast path's driver-built deltas)
    // skips even that one: the validation loop and the routing eval run
    // in-process over the already-resident rows, zero jobs.
    val localUpdates = localRelationOf(updates)
    val touched: Seq[Int] = localUpdates match {
      case Some(l) if l.output.exists(a => a.name.equalsIgnoreCase(idCol) &&
          simpleKeyType(a.dataType)) =>
        // atomic key types only: the driver HashSet's equality matches
        // SQL equality there; nested types keep the distributed stats
        val idx = l.output.indexWhere(_.name.equalsIgnoreCase(idCol))
        val kt = l.output(idx).dataType
        val route = partEvaluator(kt, kt, parts)
        val seen = new java.util.HashSet[Any]()
        val t = scala.collection.mutable.SortedSet.empty[Int]
        l.data.foreach { r =>
          val v = r.get(idx, kt)
          require(v != null && seen.add(v),
            s"updates contain duplicate or NULL $idCol keys")
          t += route(v)
        }
        if (t.isEmpty) return None // empty updates: nothing to stage
        t.toSeq
      case _ =>
        val stats = u.groupBy(col(idCol))
          .agg(count(lit(1)).as("c"), first(col(PartCol)).as("p"))
          .groupBy()
          .agg(max(col("c")).as("max_c"),
            max(col(idCol).isNull).as("has_null"),
            collect_set(col("p")).as("touched"))
          .head()
        if (stats.isNullAt(0)) return None // empty updates: nothing to stage
        require(stats.getLong(0) <= 1L && !stats.getBoolean(1),
          s"updates contain duplicate or NULL $idCol keys")
        stats.getSeq[Int](2)
    }
    val gen = allocateGen(fs, loc, manifest)
    // align the write with the table's OWN bucket count (the caller's
    // `buckets` is only a fallback for tables without a spec): a mismatch
    // is not a correctness problem — bucket ids are computed per row —
    // but it splits each bucket's rows across tasks and multiplies files
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val tableBuckets = graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident))
      .bucketSpec.map(_.numBuckets).getOrElse(buckets)
    val columnOrder = spark.table(name).columns // partition cols are last
    // live updates carry an explicit not-deleted flag ([[delete]] stages
    // its own true-flagged tombstones through this same path)
    val flagged =
      if (columnOrder.contains(DelCol) && !u.columns.contains(DelCol))
        u.withColumn(DelCol, lit(false))
      else u
    // a batch MISSING a column the table has fails the staged select
    // below (the whole-row contract: silently NULL-filling a misspelled
    // column is how corpora rot); a column added WITH A DECLARED DEFAULT
    // ([[addColumnWithDefault]]) is the sanctioned exception — fill it
    // from its own default so pre-evolution producers keep streaming
    val withDefaults = spark.table(name).schema.fields
      .filter(f => !flagged.columns.contains(f.name) &&
        f.name != PartCol && f.name != GenCol && f.name != DelCol &&
        f.metadata.contains("CURRENT_DEFAULT"))
      .foldLeft(flagged)((df, f) => df.withColumn(f.name,
        org.apache.spark.sql.functions.expr(
          f.metadata.getString("CURRENT_DEFAULT")).cast(f.dataType)))
    // GenCol is a DIRECTORY, not a data column, on this path: the staged
    // write emits per-PartCol bucketed files and the rename below adds
    // the `gen` dir level — so no per-generation literal ever enters the
    // write plan (the generated source is identical across triggers).
    val shaped = withDefaults.select(columnOrder.filterNot(_ == GenCol).map(col(_)): _*)
    // a failed stage releases its in-flight claim so vacuum can reclaim
    // the partial write instead of guarding it for the JVM lifetime
    try stageBucketedGen(spark, name, loc, fs, shaped, gen, touched, tableBuckets, idCol)
    catch { case e: Throwable => releaseGens(fs, loc, Seq(gen)); throw e }
    Some((gen, touched))
  }

  /** Write one GENERATION's bucketed files and register exactly its
    * `(partition, gen)` catalog entries — the O(touched) replacement for
    * `insertInto` on the delta path (r18).
    *
    * Why not `insertInto`: Spark's append to a catalog-partitioned table
    * LISTS EVERY PARTITION of the table before each write
    * (`InsertIntoHadoopFsRelationCommand`'s custom-location resolution),
    * so per-trigger upserts pay a metastore round trip that GROWS with
    * the accumulated generation count — measured 1.1 s per ~500-row
    * delta at the q109 gate versus ~0.2 s for the identical files
    * written without the catalog commit, and structurally O(partitions)
    * per trigger on a long-running stream. This path keeps everything
    * the catalog commit provided — bucketed file layout (the staging
    * CTAS declares the table's own bucket/sort spec, so file naming and
    * hash match the main table's scan expectations), partition-pruned
    * reads (the touched `(part, gen)` specs register via ONE batched
    * `ADD PARTITION IF NOT EXISTS`) — at O(touched) metastore work
    * regardless of table size.
    *
    * Crash contract (unchanged from the insertInto form): everything
    * here stages INVISIBLY — readers resolve generations through the
    * manifest, and `gen` is not in any committed manifest until
    * [[commitDelta]] renames one in. A crash anywhere before the commit
    * — mid-stage, or between the renames and the ADD PARTITION — leaves
    * only invisible debris: an orphan `_stage-gen` dir and/or renamed
    * gen dirs (possibly with partitions registered) that NO manifest
    * references. Recovery never reuses the crashed gen id (its intent
    * marker poisons it); replay stages a FRESH generation, and the
    * crashed one's dirs and registered partitions are reclaimed by
    * [[vacuumAndDeregister]] on the next commit.
    * The staging table is EXTERNAL (explicit path), so dropping it never
    * deletes the renamed files.
    */
  private val StageFileRe = """part-(\d+)-.*""".r

  /** ZERO-JOB staging for DRIVER-LOCAL delta frames (r20, was a one-job
    * zero-shuffle write in r19): for a LocalRelation batch (the streaming
    * sinks' localized keeper/signature/sketch frames) the bucket
    * assignment — `pmod(murmur3(id), buckets)`, the exact
    * HashPartitioning function the scan's bucket pruning recomputes —
    * evaluates DRIVER-side ([[partEvaluator]]), so the rows can be
    * grouped into (partition, bucket) slices and written STRAIGHT to the
    * staged files with Spark's own parquet row writer
    * ([[org.apache.spark.sql.execution.datasources.parquet.GraftLocalParquet]]):
    * same file layout, same `part-b` naming the bucket tagger parses,
    * same within-file id order, ZERO jobs and no Hadoop commit protocol.
    * DriverProf measured the r19 one-job form at ~525 ms per ~500-row
    * delta — all fixed cost (job scheduling + committer temp-dir dance +
    * dynamic-partition writer init), the sink family's single largest
    * driver term. Distributed or non-simple-keyed frames keep the
    * repartition path unchanged. Returns false when not applicable.
    */
  private def directStageLocal(
      spark: SparkSession, shaped: DataFrame, idCol: String,
      buckets: Int, stageDir: Path, fs: FileSystem): Boolean =
    localRelationOf(shaped) match {
      case Some(l) =>
        import org.apache.spark.sql.types._
        import org.apache.spark.sql.catalyst.InternalRow
        val attrs = l.output
        val idIdx = attrs.indexWhere(_.name.equalsIgnoreCase(idCol))
        val partIdx = attrs.indexWhere(_.name == PartCol)
        val kt = if (idIdx >= 0) attrs(idIdx).dataType else NullType
        // the atomic key types the routing expression and the id ordering
        // below handle; others keep the shuffle path (as in r19)
        val hashSafe = kt match {
          case ByteType | ShortType | IntegerType | LongType |
            FloatType | DoubleType | BooleanType | StringType => true
          case _ => false
        }
        if (idIdx < 0 || partIdx < 0 || !hashSafe) return false
        val route = partEvaluator(kt, kt, buckets)
        // internal rows already hold the routing expression's input repr
        // (UTF8String for strings), and UTF8String's Comparable IS the
        // binary order the shuffle path's sortWithinPartitions produced
        val idOrd: Ordering[InternalRow] = kt match {
          case ByteType    => Ordering.by(_.getByte(idIdx))
          case ShortType   => Ordering.by(_.getShort(idIdx))
          case IntegerType => Ordering.by(_.getInt(idIdx))
          case LongType    => Ordering.by(_.getLong(idIdx))
          case FloatType   => Ordering.by(_.getFloat(idIdx))
          case DoubleType  => Ordering.by(_.getDouble(idIdx))
          case BooleanType => Ordering.by(_.getBoolean(idIdx))
          case _           =>
            Ordering.by((r: InternalRow) => r.getUTF8String(idIdx))(
              Ordering.comparatorToOrdering(
                java.util.Comparator.naturalOrder[org.apache.spark.unsafe.types.UTF8String]()))
        }
        // group rows by (partition dir, bucket file) — the exact file
        // grain the one-job dynamic-partition write produced
        val groups = scala.collection.mutable.LinkedHashMap
          .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[InternalRow]]
        l.data.foreach { r =>
          val b = route(r.get(idIdx, kt))
          val p = r.getInt(partIdx)
          groups.getOrElseUpdate((p, b),
            scala.collection.mutable.ArrayBuffer.empty[InternalRow]) += r
        }
        // PartCol is a DIRECTORY in the staged layout, not a data column
        val dataAttrs = attrs.filterNot(_.name == PartCol)
        val dataSchema = StructType(dataAttrs.map(a =>
          StructField(a.name, a.dataType, a.nullable, a.metadata)))
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(dataAttrs, attrs)
        val conf = org.apache.spark.sql.execution.datasources.parquet
          .GraftLocalParquet.writeConf(spark, dataSchema)
        groups.foreach { case ((p, b), rows) =>
          val dir = new Path(stageDir, s"$PartCol=$p")
          if (!fs.exists(dir)) fs.mkdirs(dir)
          val file = new Path(dir,
            f"part-$b%05d-${java.util.UUID.randomUUID().toString}.parquet")
          org.apache.spark.sql.execution.datasources.parquet.GraftLocalParquet
            .writeFile(spark, conf, file, rows.sorted(idOrd).iterator.map(proj))
        }
        true
      case None => false
    }

  private def stageBucketedGen(
      spark: SparkSession, name: String, loc: Path, fs: FileSystem,
      shaped: DataFrame, gen: Long, touched: Seq[Int],
      tableBuckets: Int, idCol: String): Unit =
    graft.tools.DriverProf.time("store.write.delta") {
      val stageDir = new Path(loc, s"_stage-$gen")
      if (fs.exists(stageDir)) fs.delete(stageDir, true)
      // Bucketed files WITHOUT the bucketed-table writer: an explicit-n
      // `repartition(n, id)` is the bucket assignment function itself
      // (HashPartitioning = pmod(murmur3(id), n), exactly what the scan's
      // bucket pruning recomputes), and a REPARTITION_BY_NUM shuffle is
      // never AQE-coalesced — so write-task index == bucket id, and the
      // task-index prefix of each staged file names its bucket. The
      // rename below tags the name with the `_NNNNN` suffix the bucketed
      // scan parses. Within-task sort on (part, id) keeps the dynamic
      // writer sort-free and the file contents id-ordered like the
      // bucketed writer's.
      graft.tools.DriverProf.time("store.stage.write") {
        val direct = graft.tools.DriverProf.time("store.stage.write.direct")(
          directStageLocal(spark, shaped, idCol, tableBuckets, stageDir, fs))
        if (!direct)
          graft.tools.DriverProf.time("store.stage.write.job")(
            shaped.repartition(tableBuckets, col(idCol))
              .sortWithinPartitions(col(PartCol), col(idCol))
              .write.mode(SaveMode.Overwrite)
              .partitionBy(PartCol).parquet(stageDir.toString))
      }
      // a compaction fold can surface a partition whose surviving rows
      // are ALL tombstoned away — no staged dir then, and none needed:
      // the manifest points its live list at `gen`, which reads empty
      // (exactly what the insertInto form produced)
      val staged = touched.filter { p =>
        val src = new Path(stageDir, s"$PartCol=$p")
        fs.exists(src) && {
          val parentDir = new Path(loc, s"$PartCol=$p")
          if (!fs.exists(parentDir)) fs.mkdirs(parentDir)
          val dst = new Path(parentDir, s"$GenCol=$gen")
          require(fs.rename(src, dst), s"could not move staged generation into $dst")
          tagBucketFiles(fs, dst)
          true
        }
      }
      fs.delete(stageDir, true) // _SUCCESS marker + emptied dirs
      if (staged.nonEmpty) {
        val specs = staged
          .map(p => s"PARTITION ($PartCol=$p, $GenCol=$gen)").mkString(" ")
        // quotedString, not a raw backtick: a db-qualified `db.t` backticked
        // whole becomes ONE identifier and the ADD PARTITION fails
        // (the ADVICE-r14 bug class, fixed here like markSynced)
        val qn = spark.sessionState.sqlParser.parseTableIdentifier(name).quotedString
        graft.tools.DriverProf.time("store.stage.addparts")(
          spark.sql(s"ALTER TABLE $qn ADD IF NOT EXISTS $specs"))
      }
      ()
    }

  /** Rename each staged file to carry its `_NNNNN` bucket tag — the
    * task-index prefix IS the bucket id (see [[stageBucketedGen]]).
    */
  private def tagBucketFiles(fs: FileSystem, dst: Path): Unit =
    fs.listStatus(dst).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".parquet")) {
        val bucket = n match {
          case StageFileRe(b) => b.toInt
          case _ => sys.error(s"unexpected staged file name $n in $dst")
        }
        val dot = n.indexOf('.')
        val tagged = f"${n.substring(0, dot)}_$bucket%05d${n.substring(dot)}"
        require(fs.rename(st.getPath, new Path(dst, tagged)),
          s"could not bucket-tag staged file $n in $dst")
      }
    }

  /** Multi-generation staging for the Z-order re-layout (r18):
    * [[stageBucketedGen]] with `GenCol` as a SECOND dynamic dir level
    * (gen = base + z-prefix bucket, several generations per fold), same
    * rename + bucket-tag + batched ADD PARTITION. Replaces the
    * re-layout's `insertInto`, which paid the full catalog partition
    * listing exactly when the table is largest — a whole-table
    * re-layout. `pairs` is the (partition, generation) set the caller's
    * envelope pass already computed; dirs the write never produced (a
    * partition whose survivors all fell in other z-buckets) are skipped
    * exactly like the empty-fold case.
    */
  private def stageBucketedGens(
      spark: SparkSession, name: String, loc: Path, fs: FileSystem,
      shaped: DataFrame, stageId: Long, pairs: Seq[(Int, Long)],
      tableBuckets: Int, idCol: String): Unit =
    graft.tools.DriverProf.time("store.write.zfold") {
      val stageDir = new Path(loc, s"_stage-$stageId")
      if (fs.exists(stageDir)) fs.delete(stageDir, true)
      graft.tools.DriverProf.time("store.stage.write")(
        shaped.repartition(tableBuckets, col(idCol))
          .sortWithinPartitions(col(PartCol), col(GenCol), col(idCol))
          .write.mode(SaveMode.Overwrite)
          .partitionBy(PartCol, GenCol).parquet(stageDir.toString))
      val staged = pairs.filter { case (pt, g) =>
        val src = new Path(stageDir, s"$PartCol=$pt/$GenCol=$g")
        fs.exists(src) && {
          val parentDir = new Path(loc, s"$PartCol=$pt")
          if (!fs.exists(parentDir)) fs.mkdirs(parentDir)
          val dst = new Path(parentDir, s"$GenCol=$g")
          require(fs.rename(src, dst), s"could not move staged generation into $dst")
          tagBucketFiles(fs, dst)
          true
        }
      }
      fs.delete(stageDir, true)
      if (staged.nonEmpty) {
        val specs = staged.map { case (pt, g) =>
          s"PARTITION ($PartCol=$pt, $GenCol=$g)" }.mkString(" ")
        val qn = spark.sessionState.sqlParser.parseTableIdentifier(name).quotedString
        graft.tools.DriverProf.time("store.stage.addparts")(
          spark.sql(s"ALTER TABLE $qn ADD IF NOT EXISTS $specs"))
      }
      ()
    }

  /** Append `gen` to the touched partitions' live lists and commit — the
    * single atomic step that makes a staged generation visible.
    */
  // ------------------------------------------------------------ commit group

  /** Per-trigger COMMIT GROUP (r19 — VERDICT r18 next #1): a composed
    * streaming sink writes several store tables per micro-batch (the
    * cross-modal sink: text index + labels + forward), each upsert
    * paying an independent manifest commit + vacuum + refresh
    * mid-trigger. Inside `Store.commitGroup { ... }` those commits
    * DEFER: deltas stage normally (files move, partitions register —
    * all invisible until a manifest references them), and the group
    * flushes at the end in one tight sweep — consecutive commits of the
    * SAME table collapse into ONE manifest version + ONE vacuum + ONE
    * refresh, and different tables' commits land back-to-back instead
    * of interleaved with the trigger's Spark jobs (the narrowest
    * cross-table inconsistency window short of a shared manifest).
    *
    * Correctness: any read of a table with pending commits FLUSHES that
    * table first — manifest-resolving reads via the [[readManifestFull]]
    * chokepoint, and the raw-history entries ([[versions]],
    * [[readVersion]], [[changes]]) via their own explicit flush — so
    * within-trigger read-your-writes is preserved exactly. (Write
    * entries deliberately do NOT flush: staging against pending gens is
    * what lets same-table commits collapse.) A crash mid-group loses only
    * uncommitted staged generations — the same contract as the
    * sequential form's crash between two commits; the sinks' replay
    * watermarks already cover partial-trigger delivery.
    *
    * Thread-local, non-nesting, single-writer per table as ever.
    */
  private final class CommitGroup {
    val pending = new java.util.LinkedHashMap[String,
      (scala.collection.mutable.ArrayBuffer[(Long, Seq[Int])],
        scala.collection.mutable.LinkedHashMap[String, String])]
  }

  private val activeGroup = new ThreadLocal[CommitGroup]

  def commitGroup[T](spark: SparkSession)(body: => T): T = {
    require(activeGroup.get == null, "commit groups do not nest")
    val g = new CommitGroup
    activeGroup.set(g)
    try {
      val r = body
      graft.tools.DriverProf.time("store.commitGroup.flush") {
        while (!g.pending.isEmpty)
          flushPending(spark, g.pending.keySet.iterator.next)
      }
      r
    } finally {
      // an ABANDONED group (body or flush threw) must release its still-
      // pending gens' in-flight claims, or vacuum guards the orphaned
      // staging debris — and each entry pins a manifest snapshot — for
      // the JVM lifetime (code-review r19). The staged files themselves
      // are invisible (no manifest references them) and reclaim normally
      // once released.
      if (!g.pending.isEmpty) {
        import scala.jdk.CollectionConverters._
        g.pending.asScala.foreach { case (name, (gens, _)) =>
          try {
            val loc = tableLocation(spark, name)
            releaseGens(fsFor(spark, loc), loc, gens.map(_._1).toSeq)
          } catch { case _: Exception => () } // table may be gone; best effort
        }
      }
      activeGroup.remove()
    }
  }

  /** Commit `name`'s deferred deltas now (no-op without an active group
    * or pending entry). Pops the entry FIRST so the commit's own
    * manifest read does not re-enter.
    */
  private def flushPending(spark: SparkSession, name: String): Unit = {
    val g = activeGroup.get
    if (g != null) {
      val entry = g.pending.remove(name)
      if (entry != null) {
        val (gens, meta) = entry
        commitDeltasNow(spark, name, gens.toSeq, meta.toMap)
      }
    }
  }

  private[graft] def commitDelta(
      spark: SparkSession, name: String, gen: Long, touched: Seq[Int],
      metaUpdates: ManifestMeta = Map.empty): Unit = {
    val g = activeGroup.get
    if (g != null) {
      val entry = g.pending.computeIfAbsent(name, _ =>
        (scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])],
          scala.collection.mutable.LinkedHashMap.empty[String, String]))
      entry._1 += ((gen, touched))
      entry._2 ++= metaUpdates
      ()
    } else commitDeltasNow(spark, name, Seq((gen, touched)), metaUpdates)
  }

  /** The immediate multi-delta commit: ONE manifest version appends all
    * `gens` in order, ONE vacuum, ONE refresh — a single deferred
    * upsert degenerates to exactly the r18 commit.
    *
    * OPTIMISTIC under concurrency (r19 — VERDICT r18 next #2): a
    * 100 TB ingest wants partition-disjoint writers on one table (the
    * parallel-backfill shape), so losing the manifest CAS is no longer
    * terminal. On a lost race the commit re-reads the new latest
    * manifest and checks whether the interleaved commits touched any of
    * ITS partitions: DISJOINT → rebase (re-apply this delta over the
    * new base and retry — the staged files and registered partitions
    * are untouched, only the manifest line moves), OVERLAPPING → loud
    * refusal, because an overlapping concurrent writer may have merged
    * against a pre-image this commit invalidates (the lost-update class
    * the single-writer contract existed to prevent), and its staged
    * generation is released for vacuum. Writer threads must share this
    * JVM (see [[inFlightGens]]); cross-process writers keep the
    * single-writer contract.
    */
  private def commitDeltasNow(
      spark: SparkSession, name: String, gens: Seq[(Long, Seq[Int])],
      metaUpdates: ManifestMeta): Unit =
    graft.tools.DriverProf.time("store.commitDelta") {
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val snaps = Option(inFlightGens.get(inFlightKey(fs, loc)))
    var attempt = 0
    var committed = false
    try {
      while (!committed) {
        val (v, manifest, meta) = readManifestRaw(spark, name).getOrElse(
          sys.error(s"generational store table $name has no manifest"))
        // CONFLICT CHECK against each gen's STAGE-TIME snapshot: if any
        // of this delta's partitions gained generations since its stage
        // read, an overlapping writer committed in between — this
        // writer's merge may be based on a pre-image that commit
        // replaced (the lost-update class), so refuse loudly. A change
        // confined to OTHER partitions is the disjoint-writer case:
        // commit (or rebase, below) proceeds.
        gens.foreach { case (gen, touched) =>
          snaps.flatMap(s => Option(s.get(gen))).foreach { snap =>
            val overlap = touched.filter(p =>
              manifest.getOrElse(p, Seq.empty) != snap.getOrElse(p, Seq.empty))
            if (overlap.nonEmpty)
              throw new IllegalStateException(
                s"concurrent writers touched overlapping partitions of $name " +
                  s"(${overlap.sorted.mkString(", ")}): generation $gen was " +
                  "staged against a pre-image another commit has since " +
                  "replaced — partition-disjoint writers rebase automatically; " +
                  "overlapping writers must serialize")
          }
        }
        val updated = gens.foldLeft(manifest) { case (m0, (gen, touched)) =>
          touched.foldLeft(m0) { (m, p) =>
            m.updated(p, m.getOrElse(p, Seq.empty) :+ gen)
          }
        }
        try {
          writeManifest(fs, loc, v + 1L, updated, meta ++ metaUpdates)
          committed = true
        } catch {
          case e: IllegalStateException =>
            attempt += 1
            if (attempt >= 16)
              throw new IllegalStateException(
                s"cannot claim manifest version for $name after $attempt " +
                  "lost races — writer contention is pathological, or a " +
                  "crashed writer's manifest lock needs manual removal " +
                  "(remove the lock after confirming no writer is live)", e)
            // brief backoff, then the loop re-reads the new base: the
            // snapshot conflict check above refuses overlap, a disjoint
            // interleaved commit rebases, and a crashed lock exhausts
            // the bounded retries loudly
            Thread.sleep(10L * attempt)
        }
      }
    } finally {
      // success: the gens are referenced, intents retire via vacuum.
      // refusal/failure: the staged generation is abandoned — release it
      // so vacuum reclaims the orphan instead of guarding it forever.
      releaseGens(fs, loc, gens.map(_._1))
    }
    vacuumAndDeregister(spark, name, fs, loc)
    forceRefresh(spark, name)
  }

  /** Metadata-only commit: a new manifest version with the SAME
    * partition/generation map and updated meta pairs — zero generation
    * files, zero Spark jobs. The streaming sketch sinks' empty-trigger
    * watermark advance (r19): where the guard-row form staged one guard
    * generation per empty trigger, this moves one small text file.
    */
  def commitMetaOnly(
      spark: SparkSession, name: String, metaUpdates: ManifestMeta): Unit = {
    val g = activeGroup.get
    if (g != null) {
      // deferred like any commit: the meta rides the table's flush
      // (its own version if no delta is pending)
      val entry = g.pending.computeIfAbsent(name, _ =>
        (scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])],
          scala.collection.mutable.LinkedHashMap.empty[String, String]))
      entry._2 ++= metaUpdates
      return
    }
    graft.tools.DriverProf.time("store.commitMetaOnly") {
      val loc = tableLocation(spark, name)
      val fs = fsFor(spark, loc)
      val (v, manifest, meta) = readManifestRaw(spark, name).getOrElse(
        sys.error(s"generational store table $name has no manifest"))
      writeManifest(fs, loc, v + 1L, manifest, meta ++ metaUpdates)
      vacuumAndDeregister(spark, name, fs, loc)
      // no data file moved, so this session's caches stay valid — advance
      // an EXISTING record to the new stamp so the next read skips the
      // needless refresh; an absent record stays absent (it may be absent
      // because a rebuild invalidated it, and claiming freshness here
      // would skip a refresh that rebuild made necessary)
      val stamp = visibilityStamp(spark, name)
      if (stamp.nonEmpty)
        sessionRefreshes(spark).computeIfPresent(name, (_, _) => stamp)
      ()
    }
  }

  private def stageAndCommitDelta(
      spark: SparkSession, name: String, updates: DataFrame, idCol: String,
      buckets: Int, metaUpdates: ManifestMeta = Map.empty): Unit =
    stageDelta(spark, name, updates, idCol, buckets) match {
      case Some((gen, touched)) =>
        commitDelta(spark, name, gen, touched, metaUpdates)
      case None =>
        // empty batch: nothing staged, but caller-supplied meta (the
        // sketch watermark) must still land
        if (metaUpdates.nonEmpty) commitMetaOnly(spark, name, metaUpdates)
    }

  /** Keyed DELETE (the ES `delete(id=...)` / right-to-erasure analog): the
    * keys are staged as a TOMBSTONE delta generation — same append-only,
    * crash-atomic commit as [[upsert]], O(batch) strictly — and [[read]]'s
    * newest-wins merge resolves a surviving tombstone to "key absent".
    * [[compact]] makes the erasure PHYSICAL: the fold keeps only the
    * newest live version per key and drops resolved tombstones, so after
    * the retention window passes (last-2 manifests, then vacuum) no file
    * holds the deleted rows — the compliance-grade delete path a 100 TB
    * corpus needs, at segment-merge cost rather than table-rewrite cost.
    * Deleting an absent key is a no-op tombstone (harmless, folded away).
    */
  def delete(spark: SparkSession, name: String, keys: DataFrame, idCol: String,
      buckets: Int = 16): Unit = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    val schema = spark.table(name).schema
    require(schema.fieldNames.contains(DelCol),
      s"$name predates tombstone support — rebuild via bulkWrite to enable deletes")
    val tomb = schema.fields
      .filterNot(f => f.name == PartCol || f.name == GenCol)
      .foldLeft(keys.select(col(idCol))) { (df, f) =>
        if (f.name == idCol) df
        else if (f.name == DelCol) df.withColumn(DelCol, lit(true))
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }
    stageAndCommitDelta(spark, name, tomb, idCol, buckets)
  }

  // ------------------------------------------------------------ compaction

  /** One partition's live-file footprint: how many generations its chain
    * carries and what they cost to read.
    */
  final case class PartStat(part: Int, nGens: Int, nFiles: Long, bytes: Long)

  /** What [[compact]] did: which partitions folded into which generation,
    * and the live-file collapse it bought.
    */
  final case class CompactionResult(
      foldedParts: Seq[Int], gen: Long, filesBefore: Long, filesAfter: Long)

  /** Live-file manifest of a generational table: per partition, the
    * generation count and the file count/bytes across its LIVE
    * generations only (orphans and retained-but-superseded generations
    * excluded — they cost disk until vacuum, not reads). Pure FS
    * metadata, no Spark job.
    */
  def fileStats(spark: SparkSession, name: String): Seq[PartStat] = {
    requireTable(spark, name)
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val manifest = readManifest(spark, name).map(_._2).getOrElse(Map.empty)
    manifest.toSeq.sortBy(_._1).map { case (p, gens) =>
      val files = gens.flatMap { g =>
        val d = new Path(loc, s"$PartCol=$p/$GenCol=$g")
        if (fs.exists(d))
          fs.listStatus(d).toSeq.filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        else Seq.empty
      }
      PartStat(p, gens.size, files.size.toLong, files.map(_.getLen).sum)
    }
  }

  /** The partitions worth folding: any carrying a delta chain (>1 live
    * generation — each chained generation is both a merge-rank tax on
    * every read and a file-count multiplier). The q150 planning rule
    * specialized to the store layout, computed from the same live-file
    * manifest [[fileStats]] reports.
    */
  def compactionPlan(spark: SparkSession, name: String): Seq[PartStat] =
    fileStats(spark, name).filter(_.nGens > 1)

  /** STAT-DRIVEN compaction (r17 — VERDICT r16 #4): fold only when — and
    * only WHERE — the live-file manifest says it pays. The count-based
    * `compactEvery` cadence this replaces in the streaming sinks folded
    * EVERYTHING every N applied batches: a quiet partition paid the fold
    * without needing it, and a hot partition's chain could reach N
    * before the cadence caught it. Here the per-part stats
    * ([[compactionPlan]] — pure FS metadata, no Spark job) gate the
    * decision per partition: a partition folds when its delta chain
    * reaches `maxChain` generations (every chained generation is a
    * merge-rank tax on every read) or its live-file count reaches
    * `maxPartFiles` (open/footer cost on every scan). For a stream whose
    * batches touch every partition, `maxChain = N` reproduces the old
    * every-N cadence exactly; for skewed streams it is strictly better
    * on both sides. Returns None when nothing crossed (the common quiet
    * trigger — cost: one manifest read + per-partition dir listings).
    */
  def compactIfNeeded(
      spark: SparkSession, name: String,
      maxChain: Int = 8, maxPartFiles: Int = 64): Option[CompactionResult] = {
    val crossed = compactionPlan(spark, name)
      .filter(s => s.nGens >= maxChain || s.nFiles >= maxPartFiles)
    if (crossed.isEmpty) None
    else Some(compact(spark, name, onlyParts = Some(crossed.map(_.part))))
  }

  /** COMPACTION EXECUTOR — physically fold the planned partitions' delta
    * chains: read their merged (newest-wins) rows, write them back as ONE
    * fresh generation (bucket-aligned, so exactly one file per non-empty
    * bucket per partition), and commit the manifest entry that replaces
    * each folded partition's chain with the new generation. The fold is
    * crash-atomic like every other write (staged generation + manifest
    * rename); superseded generations are vacuumed on the NEXT commit
    * (last-2 manifest retention protects in-flight readers).
    *
    * This is the executable half of the q150 compaction plan — and the
    * engine-side analog of the ES/Lucene segment force-merge the
    * reference's per-document ingest loop depends on
    * (`/root/reference/src/elasticsearch_ingest.py:107-148` writes one
    * doc per call and lets the cluster merge segments behind it).
    * Untouched partitions are not read, not written, and their files stay
    * byte-identical.
    */
  def compact(
      spark: SparkSession, name: String,
      onlyParts: Option[Seq[Int]] = None,
      zorder: Option[ZorderSpec] = None): CompactionResult = {
    requireTable(spark, name)
    refreshIfMoved(spark, name)
    require(spark.table(name).columns.contains(GenCol),
      s"$name is not a generational store table — nothing to compact")
    // a Z-ordered compaction is a RE-LAYOUT: it folds every live
    // partition (delta chain or not), because the box-read pruning it
    // buys needs the whole table's rows under envelope-tracked
    // generations; a plain compaction folds only chained partitions
    val plan = zorder match {
      case Some(_) => fileStats(spark, name)
      case None    => compactionPlan(spark, name)
    }
    val folds = onlyParts match {
      case Some(ps) => plan.filter(s => ps.contains(s.part))
      case None     => plan
    }
    val statsBefore = fileStats(spark, name)
    if (folds.isEmpty)
      return CompactionResult(Seq.empty, -1L,
        statsBefore.map(_.nFiles).sum, statsBefore.map(_.nFiles).sum)
    val loc = tableLocation(spark, name)
    val fs = fsFor(spark, loc)
    val (v, manifest, carriedMeta) = readManifestFull(spark, name).getOrElse(
      sys.error(s"generational store table $name has no manifest"))
    val idCol = idColOf(spark, name)
    val foldParts = folds.map(_.part)
    val t = spark.table(name)
    val liveCond = foldParts.map { p =>
      col(PartCol) === p && col(GenCol).isin(manifest(p): _*)
    }.reduce(_ || _)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    // bucket-count fallback, NOT the partition-count constant: the two
    // defaults coincide at 16 today, but a fold repartitioned by the
    // wrong constant would split each bucket's rows across tasks and
    // multiply files — the blowup compact exists to remove
    val tableBuckets = graft.tools.DriverProf.time("store.getTableMetadata")(spark.sessionState.catalog.getTableMetadata(ident))
      .bucketSpec.map(_.numBuckets).getOrElse(DefaultBuckets)
    val w = Window.partitionBy(col(idCol)).orderBy(col(GenCol).desc)
    val columnOrder = t.columns
    val newest = t.filter(liveCond)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // the fold sees each folded partition's WHOLE chain, so a tombstone
    // that wins its key has nothing left to shadow — drop it and the
    // deletion becomes physical once retention vacuums the old chain
    val survivors =
      if (columnOrder.contains(DelCol)) newest.filter(!col(DelCol)) else newest
    def finish(gen0: Long): CompactionResult = {
      vacuumAndDeregister(spark, name, fs, loc)
      forceRefresh(spark, name)
      val after = fileStats(spark, name)
      CompactionResult(foldParts, gen0,
        statsBefore.map(_.nFiles).sum, after.map(_.nFiles).sum)
    }
    zorder match {
      case None =>
        val gen = allocateGen(fs, loc, manifest)
        val folded = survivors
          .select(columnOrder.filterNot(_ == GenCol).map(col(_)): _*)
          // materialize the fold (its footprint is the folded partitions,
          // not the table) so the append below does not read the table it
          // extends; stageBucketedGen applies the bucket repartition
          .localCheckpoint()
        // staged-gen write, not insertInto (r18) — same O(touched)
        // catalog contract as the delta path (see stageBucketedGen)
        stageBucketedGen(spark, name, loc, fs, folded, gen, foldParts,
          tableBuckets, idCol)
        val updated = foldParts.foldLeft(manifest)((m, p) => m.updated(p, Seq(gen)))
        try writeManifest(fs, loc, v + 1L, updated, carriedMeta)
        finally releaseGens(fs, loc, Seq(gen))
        finish(gen)

      case Some(zs) =>
        require(zs.dims.nonEmpty && zs.dims.forall(columnOrder.contains),
          s"z dimensions must be table columns: ${zs.dims.mkString(", ")}")
        val nBuckets = 1 << zs.bucketBits
        val gen0 = allocateGenRange(fs, loc, manifest, nBuckets)
        // ONE materialization of the fold, then three cheap passes over it
        // (quantization plan, envelopes, write) — and the append cannot
        // read the table it extends
        val survChk = survivors.localCheckpoint()
        val zplan = graft.ops.Layout.quantizationPlan(survChk, zs.dims, zs.bits)
        // generation = base + z-prefix bucket: rows of one partition land
        // in one generation PER BUCKET, key-disjoint by construction
        val zRows = graft.ops.Layout.withZ(survChk, zplan, zs.bits, zs.bucketBits)
          .withColumn(GenCol, graft.functions.StableLit.stable_lit(gen0) + col("z_bucket"))
        val envAggs = count(lit(1)).as("n") +: zs.dims.flatMap(d => Seq(
          min(col(d).cast("long")).as(s"mn_$d"),
          max(col(d).cast("long")).as(s"mx_$d")))
        // bounded driver-side state: ≤ parts × 2^bucketBits envelope rows
        // (the k-means-codebook class of collect)
        val envRows = zRows.groupBy(col(PartCol), col(GenCol))
          .agg(envAggs.head, envAggs.tail: _*).collect()
        require(envRows.forall(r => !r.isNullAt(1)),
          "z-order compaction requires non-null values in every z " +
            "dimension — filter or impute upstream (a NULL has no cell on " +
            "the curve)")
        val envs = envRows.map { r =>
          ZEnv(r.getInt(0), r.getLong(1),
            zs.dims.indices.map(i => r.getLong(3 + 2 * i)),
            zs.dims.indices.map(i => r.getLong(4 + 2 * i)))
        }.toSeq
        // staged multi-gen write, not insertInto (r18): O(touched pairs)
        // catalog work for the one operation that touches every partition
        stageBucketedGens(spark, name, loc, fs,
          zRows.drop("z", "z_bucket").select(columnOrder.map(col(_)): _*),
          gen0, envs.map(e => (e.part, e.gen)), tableBuckets, idCol)
        val gensByPart: Map[Int, Seq[Long]] = envs.groupBy(_.part)
          .map { case (p, es) => p -> es.map(_.gen).sorted.toSeq }
        val updated = foldParts.foldLeft(manifest) { (m, p) =>
          gensByPart.get(p) match {
            case Some(gs) => m.updated(p, gs)
            case None     => m - p // partition emptied by the tombstone fold
          }
        }
        // a PARTIAL z-compact (onlyParts) must not strip pruning from
        // partitions a PRIOR z-compact already covered: carry the previous
        // sidecar's envelopes forward for every partition not folded this
        // time, provided the dims match (envelopes are raw per-dim min/max
        // — plan-independent — so layouts from different quantization
        // plans coexist; different DIMS would misalign readBox's bounds,
        // so those are dropped and their partitions fall back to the exact
        // path). Code-review r13 #4.
        val carried = readZmap(spark, name) match {
          case Some(pz) if pz.spec.dims == zs.dims =>
            pz.envs.filterNot(e => foldParts.contains(e.part))
          case _ => Seq.empty
        }
        // sidecar BEFORE the manifest commit, via the SAME tmp+rename
        // discipline as the manifest (code-review r13 #2b — an in-place
        // create could expose a truncated file mid-write): a crash here
        // leaves a sidecar for a version that never committed — harmless,
        // because readers trust it only where a partition's live
        // generations are a subset of the sidecar's (none will be)
        val ztmp = new Path(loc, s"_zmap-${v + 1L}.txt.tmp")
        val out = fs.create(ztmp, true)
        out.write(renderZmap(ZMap(zs, zplan, carried ++ envs)).getBytes("UTF-8"))
        out.close()
        require(fs.rename(ztmp, zmapPath(loc, v + 1L)),
          s"zmap sidecar rename failed for version ${v + 1L}")
        try writeManifest(fs, loc, v + 1L, updated, carriedMeta)
        finally releaseGens(fs, loc, (0 until nBuckets).map(gen0 + _))
        finish(gen0)
    }
  }
}
