package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, collect_set, count, first, hash, lit, max, pmod}
import org.apache.spark.sql.types.StructType

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
  * Physical layout of a store table: hash-prefix PARTITIONED on
  * `__p = pmod(hash(id), parts)` and BUCKETED on the id within each
  * partition. The partition column is what makes [[upsert]] incremental
  * (only partitions containing updated keys are rewritten — the analog of
  * ES touching only the shards its routed documents live on); the buckets
  * are what make point lookups and key joins prune/co-locate. `__p` is an
  * internal column: [[read]] drops it, writers derive it.
  */
object Store {

  /** Internal hash-prefix partition column. */
  private val PartCol = "__p"
  private val PartsProp = "graft.parts"
  private val DefaultParts = 16

  private def withPart(df: DataFrame, idCol: String, parts: Int): DataFrame =
    df.withColumn(PartCol, pmod(hash(col(idCol)), lit(parts)))

  /** The partition-count a table was created with (recorded in table
    * properties so writers from ANY session derive the same key→partition
    * mapping — `hash` is seed-fixed murmur3, stable across JVMs).
    */
  private def partsOf(spark: SparkSession, name: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    spark.sessionState.catalog.getTableMetadata(ident)
      .properties.get(PartsProp).map(_.toInt).getOrElse(DefaultParts)
  }

  /** S6: declare + create an empty managed table with an explicit schema.
    * Errors if an incompatible table already exists (ES `indices.create`
    * semantics without the ignore-400 of the reference).
    */
  def createTable(spark: SparkSession, name: String, schema: StructType): Unit =
    spark.catalog.createTable(name, "parquet", schema, Map.empty[String, String])

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
    * snapshot semantics of an offline rebuild). Lays the table out
    * partitioned by the id's hash prefix + bucketed by the id (see object
    * doc) — at 100 TB this pairing is what replaces inverted-index routing:
    * lookups prune to one bucket, upserts rewrite only touched partitions.
    */
  def bulkWrite(
      df: DataFrame, name: String, idCol: String,
      declared: Option[StructType] = None, buckets: Int = 16,
      parts: Int = DefaultParts): Unit = {
    declared.foreach { s =>
      require(conforms(df, s), s"schema does not conform to declared mapping for $name")
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
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition on the id with the bucket count: HashPartitioning(id, n)
    // is exactly the bucket-assignment function, so every task holds ONE
    // bucket's rows and writes one file per partition dir it touches.
    // Without this, a bucketed write emits a file per (task × dir × bucket)
    // — the classic small-files blowup (measured: 3,600 rows → ~3,600
    // files), which is also wrong at 100 TB where the commit protocol
    // renames every one of them.
    withPart(df, idCol, parts).repartition(buckets, col(idCol)).write
      .mode(SaveMode.Overwrite)
      .partitionBy(PartCol)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .saveAsTable(name)
    spark.sql(s"ALTER TABLE `$name` SET TBLPROPERTIES ('$PartsProp' = '$parts')")
  }

  /** Read a store table (internal partition column dropped). Upserts change
    * the backing files, and a session that read the table before an upsert
    * holds a stale file listing (possibly written from another session,
    * e.g. a streaming micro-batch clone) — so reads always refresh first.
    */
  def read(spark: SparkSession, name: String): DataFrame = {
    spark.catalog.refreshTable(name)
    spark.table(name).drop(PartCol)
  }

  /** Keyed upsert (the actual ES `index(id=...)` semantics): rows in
    * `updates` replace same-key rows in the table, new keys append.
    * INCREMENTAL copy-on-write: updated keys hash to a set of `__p`
    * partitions; only those partitions are read (partition-pruned scan),
    * merged (existing ∖ updates ∪ updates) and rewritten via dynamic
    * partition overwrite. Untouched partitions are not read, not written,
    * and their files stay byte-identical (StoreSpec pins this) — so the
    * cost of an upsert scales with the BATCH footprint, not the table size.
    * The reference behavior this replaces is incremental per-document ES
    * indexing (`elasticsearch_ingest.py:107-148`).
    *
    * Single-writer: concurrent upserts to the same table race on the
    * partition overwrite — serialize writers per table (the streaming sink
    * does, one micro-batch at a time).
    * `updates` must be unique on `idCol` (checked): duplicate update keys
    * have no defined winner.
    */
  def upsert(spark: SparkSession, name: String, updates: DataFrame, idCol: String,
      buckets: Int = 16): Unit = {
    spark.catalog.refreshTable(name)
    // a table without the hash-prefix layout (created by createTable, or
    // any externally-made flat table) still upserts correctly — it just
    // pays the legacy full-table copy-on-write, since there is no
    // partition boundary to scope the rewrite to
    if (!spark.table(name).columns.contains(PartCol)) {
      // one validation job: duplicate keys have no defined winner, and a
      // NULL key can never be replaced (SQL joins don't match NULLs — it
      // would append forever; ES likewise rejects a null _id)
      val badKeys = updates.groupBy(idCol).count()
        .filter(col("count") > 1 || col(idCol).isNull).limit(1).count()
      require(badKeys == 0L, s"updates contain duplicate or NULL $idCol keys")
      val merged = spark.table(name)
        .join(updates.select(col(idCol)), Seq(idCol), "left_anti")
        .unionByName(updates)
        .select(spark.table(name).columns.map(col(_)): _*)
        .localCheckpoint()
      merged.write.mode(SaveMode.Overwrite).insertInto(name)
      spark.catalog.refreshTable(name)
      return
    }
    val parts = partsOf(spark, name)
    // align the write with the table's OWN bucket count (the caller's
    // `buckets` is only a fallback for tables without a spec): a mismatch
    // is not a correctness problem — bucket ids are computed per row —
    // but it splits each bucket's rows across tasks and multiplies files
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val tableBuckets = spark.sessionState.catalog.getTableMetadata(ident)
      .bucketSpec.map(_.numBuckets).getOrElse(buckets)
    val u = withPart(updates, idCol, parts)
    // ONE job over the batch computes the key validation (duplicate keys
    // have no defined winner; a NULL key can never be replaced — SQL joins
    // don't match NULLs, it would append forever, and ES likewise rejects
    // a null _id) AND the touched-partition list (at most `parts` small
    // integers — a driver-side value list that becomes a static
    // partition-pruning filter). These were two separate jobs until r8;
    // per-micro-batch upserts pay the fixed job cost 4× per trigger.
    val stats = u.groupBy(col(idCol))
      .agg(count(lit(1)).as("c"), first(col(PartCol)).as("p"))
      .groupBy()
      .agg(max(col("c")).as("max_c"),
        max(col(idCol).isNull).as("has_null"),
        collect_set(col("p")).as("touched"))
      .head()
    if (stats.isNullAt(0)) return // empty updates: nothing to validate or write
    require(stats.getLong(0) <= 1L && !stats.getBoolean(1),
      s"updates contain duplicate or NULL $idCol keys")
    val touched = stats.getSeq[Int](2)
    val kept = spark.table(name)
      .filter(col(PartCol).isin(touched: _*))
      .join(u.select(col(idCol)), Seq(idCol), "left_anti")
    val columnOrder = spark.table(name).columns // partition col is last
    val merged = kept.unionByName(u).select(columnOrder.map(col(_)): _*)
      // bucket-aligned repartition — same rationale as in bulkWrite
      .repartition(tableBuckets, col(idCol))
      // materialize the merged batch (its footprint is touched-partitions
      // sized, not table sized) so the overwrite below does not read the
      // table it rewrites — Spark rejects a self-referencing overwrite
      .localCheckpoint()
    // dynamic partition overwrite: only partitions present in `merged`
    // (= the touched set) are replaced; the commit stages under the table
    // dir and swaps per-partition, so the live table is readable throughout.
    // The mode must be set on the session conf — insertInto ignores the
    // per-writer option (it resolves against the catalog table, not a
    // DataSource with write options) — so set/restore it around the write.
    // BLAST RADIUS (ADVICE r5): the conf is session-global for the window,
    // so the single-writer rule extends to the whole session — do not run
    // ANY other Overwrite-mode write concurrently with an upsert (it would
    // silently inherit dynamic semantics, and the restore races). Callers
    // needing concurrent overwrites should run the upsert on a dedicated
    // `spark.newSession()` child, which carries its own conf.
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try merged.write.mode(SaveMode.Overwrite).insertInto(name)
    finally prevMode match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None    => spark.conf.unset(modeKey)
    }
    spark.catalog.refreshTable(name)
  }
}
