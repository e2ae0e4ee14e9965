package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md §B). One parquet per table under `sfDir`.
  *
  * At 100 TB these would be partitioned/bucketed managed tables; the loader
  * keeps the access path behind one function so the storage layout can change
  * without touching query code.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped in two physical layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as LONG via the session's
    * `spark.sql.legacy.parquet.nanosAsLong`, truncated ns→µs here) and
    * plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both normalize to
    * the session-tz TIMESTAMP every downstream query/stream consumes —
    * the session runs UTC, so the NTZ→TZ cast preserves the micros value
    * and matches DuckDB's naive µs timestamps either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scale-adaptive scan spread (r19, guide §2.5 input-skew fix): when the
    * source layout yields fewer splits than the session's parallelism —
    * the fixture tables are single-row-group parquet, unsplittable at any
    * `maxPartitionBytes` — redistribute ONCE so per-row-heavy aggregation
    * work (distinct-agg expands, regex batteries) runs at full width.
    * At real scale a table scan carries ≥ parallelism splits and this is
    * the IDENTITY (no exchange added): the condition reads the actual
    * planned split count, so nothing here is tuned to local mode. Column
    * pruning pushes through the round-robin repartition, so the exchange
    * carries only the columns the query consumes.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
