package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the
      // vectorized reader rejects; read as long and convert (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs (not INT96) so DuckDB/pyarrow read our output losslessly.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
}
