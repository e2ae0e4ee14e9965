package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
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
  */
object Store {

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
    * snapshot semantics of an offline rebuild). `bucketBy` co-locates rows
    * by key so downstream joins/point-lookups prune to one bucket — at
    * 100 TB this is what replaces the inverted-index routing.
    */
  def bulkWrite(
      df: DataFrame, name: String, idCol: String,
      declared: Option[StructType] = None, buckets: Int = 16): Unit = {
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
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .saveAsTable(name)
  }

  /** Read a store table. Upserts rewrite the backing files in place, and a
    * session that read the table before an upsert holds a stale file
    * listing (possibly written from another session, e.g. a streaming
    * micro-batch clone) — so reads always refresh first. A log-based table
    * format would make this a metadata lookup instead.
    */
  def read(spark: SparkSession, name: String): DataFrame = {
    spark.catalog.refreshTable(name)
    spark.table(name)
  }

  /** Keyed upsert (the actual ES `index(id=...)` semantics): rows in
    * `updates` replace same-key rows in the table, new keys append.
    * Copy-on-write over immutable parquet: existing ∖ updates ∪ updates →
    * staged table → catalog rename. At 100 TB a log-based table format
    * would rewrite only affected file groups; the full rewrite is the
    * honest batch-snapshot cost without a transaction log.
    *
    * Single-writer: concurrent upserts to the same table race on the
    * staging name and the swap — serialize writers per table (the
    * streaming sink does, one micro-batch at a time).
    * `updates` must be unique on `idCol` (checked): duplicate update keys
    * have no defined winner.
    */
  def upsert(spark: SparkSession, name: String, updates: DataFrame, idCol: String,
      buckets: Int = 16): Unit = {
    val staged = s"${name}__staged"
    val dupKeys = updates.groupBy(idCol).count().filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0L, s"updates contain duplicate $idCol keys — no defined winner")
    val merged = read(spark, name)
      .join(updates.select(idCol).distinct(), Seq(idCol), "left_anti")
      .unionByName(updates)
    // stage first (the live table stays intact while the new snapshot
    // writes), then swap via metadata ops only — one data write, and the
    // vulnerable window is two catalog operations, not a table rewrite.
    // Readers go through the self-refreshing read() below, so the swap
    // can't strand them on a stale file listing.
    merged.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .saveAsTable(staged)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"ALTER TABLE $staged RENAME TO $name")
    spark.catalog.refreshTable(name)
  }
}
