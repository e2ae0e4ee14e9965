package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch forms; the
  * streaming twins live in [[graft.streaming.EventStream]]).
  */
object Events {

  /** Tumbling-window aggregate: one row per (window-start, optional keys).
    * Uses `date_trunc` so the batch form and a DuckDB oracle align exactly;
    * the streaming form uses `window(ts, ...)` with identical epoch-aligned
    * boundaries.
    */
  def tumblingHourly(events: DataFrame, valueCol: String = "value"): DataFrame =
    events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(graft.Num.dec6(col(valueCol))), 2).cast("double").as("total_value"))

  /** Sliding-window aggregate: 1-hour windows every 30 minutes, each event
    * contributing to 2 overlapping windows (Spark's `window(ts, len,
    * slide)` — epoch-aligned starts, same as the batch `date_trunc` math).
    */
  def slidingHourly(events: DataFrame, valueCol: String = "value"): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(graft.Num.dec6(col(valueCol))), 2).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Classic
    * lag-and-running-sum; the single shuffle is the partitionBy(user).
    * (The streaming twin is `session_window` / flatMapGroupsWithState.)
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull || (us - prevUs) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("session_seq", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sessions per user + events per user from [[sessionize]]. */
  def sessionCounts(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy(col("user_id"))
      .agg(max(col("session_seq")).as("n_sessions"), count(lit(1)).as("n_events"))
}
