package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) a DuckDB oracle twin with IDENTICAL column names and
  * rounding, so the driver's sorted-hash compare is stable across engines.
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Session settings shared by Verify / Bench / tests.
  *
  * Scale notes (100 TB design point): these are the *local[32]* values; on a
  * real cluster the same code runs with shuffle partitions sized to
  * input-bytes / 128 MB and AQE coalescing down. Nothing in the query layer
  * assumes local mode.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // runtime row-group pruning: inject bloom filters from the small side
      // of a join into the big side's scan (the SURVEY §4.2 posting-table
      // idea, done by the engine itself at runtime)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // keep bucketed scans on even when no exchange is avoided: the
      // planner's auto-disable heuristic ignores bucket PRUNING, which is
      // the whole point of the Store point-lookup path (read 1/N buckets
      // for an id lookup — the ES _id-routing analog, StoreSpec pins it)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      // early testdata generations stored events.ts as INT64
      // TIMESTAMP(NANOS), which the vectorized reader rejects; the flag
      // reads those as long and Tables.events converts. Current testdata
      // ships plain TIMESTAMP(MICROS) (the flag is then inert) —
      // Tables.events dispatches on the loaded type, so both layouts work.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs (not INT96) so DuckDB/pyarrow read our output losslessly.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // bounded collects (`limit(cap).collect()` — the Store.localized
      // fast path every streaming trigger leans on) run executeTake's
      // partition-doubling scan: 1 partition, then 4x, then 16x... so an
      // UNDER-limit frame — the common case by design — pays 2-3 jobs
      // per collect instead of one. Start the take at the full local
      // parallelism so a micro-batch-sized frame collects in ONE job;
      // a genuinely limit-satisfying scan still stops early within it.
      .config("spark.sql.limit.initialNumPartitions", "64")
      // the whole-stage-codegen compile cache is 100 entries by default
      // (a STATIC conf — set it here or never): a multi-plan streaming
      // trigger or a many-query battery cycles past that and re-runs
      // Janino on plans it compiled seconds ago — the q120 battery
      // profile pinned the residual in-battery overhead on exactly this.
      // 5000 entries keeps a full bench run's codegen units resident;
      // entries are evicted classes, so the cost is metaspace, bounded
      // in practice by distinct plan shapes, not query count.
      .config("spark.sql.codegen.cache.maxEntries", "5000")

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** [[builder]] with a PERSISTENT catalog: Hive metastore on embedded
    * Derby under `dir/metastore_db`, warehouse under `dir/warehouse`.
    * With the default in-memory catalog, a [[graft.sources.Store]] table
    * outlives the JVM only as orphaned files — a second process sees data
    * but no table (VERDICT r4 missing #7; Store.bulkWrite works around the
    * stale-location half of that). Built this way, tables created by one
    * process are catalog-visible to the next (StoreSpec proves it with two
    * real JVMs). Embedded Derby is single-process — one writer JVM at a
    * time; production would point ConnectionURL at a shared metastore
    * service instead, same code path.
    */
  def persistentBuilder(
      master: String, shufflePartitions: Int, dir: String): SparkSession.Builder =
    builder(master, shufflePartitions)
      .config("spark.sql.warehouse.dir", s"$dir/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$dir/metastore_db;create=true")
      .enableHiveSupport()
}

/** Cross-engine-stable numeric helpers.
  *
  * Double aggregation order differs between Spark partitions and the DuckDB
  * oracle, so money/measure columns are cast to exact DECIMAL before
  * aggregation and only converted back to double after the final `round` —
  * both engines then perform identical exact arithmetic (ADVICE.md r1).
  */
object Num {
  /** Exact 2-dp decimal view of a double measure (prices, quantities). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact 4-dp decimal view (discount-like small rates). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact 6-dp decimal view (full-precision synthetic measures). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
}
