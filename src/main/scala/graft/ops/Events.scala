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

  /** Range (interval-containment) join: pairs every `points` row with every
    * `intervals` row whose `[startCol, endCol]` contains its `tsCol` —
    * WITHOUT the theta-join plan (Spark executes a bare `ts BETWEEN s AND e`
    * join as BroadcastNestedLoop/cartesian: |P|×|I| comparisons). Both
    * sides are keyed by time bucket — an interval explodes to each bucket
    * it overlaps, a point lands in exactly one — so the planner gets an
    * EQUI-join on the bucket and the exact predicate only filters bucket
    * collisions. A point's single bucket meets each interval at most once,
    * so no dedup is needed. Pick `bucketSeconds` ≈ typical interval length
    * (PlanSpec asserts the q60 plan has no nested-loop/cartesian node).
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val usPerBucket = bucketSeconds * 1000000L
    def bucketOf(c: Column) = floor(unix_micros(c) / usPerBucket)
    val p = points.withColumn("__bucket", bucketOf(col(tsCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** As-of join (an operator Spark has no native form of): for every `left`
    * row, attach `rightPayload` from the LATEST `right` row with the same
    * key and `right.ts <= left.ts` (DuckDB/kdb ASOF-LEFT-JOIN semantics —
    * the q59 oracle uses DuckDB's native `ASOF LEFT JOIN` as an independent
    * check). The canonical training-pipeline primitive: join each example
    * to the newest feature snapshot / model checkpoint at its timestamp.
    *
    * Shape: union both sides, ONE window over (key, ts) with a running
    * `last(payload, ignoreNulls)` — a single hash shuffle on the key.
    * The naive formulation (theta-join on `ts_r <= ts_l` + max-per-left)
    * expands to |left|×|right| rows per key before reducing; this never
    * materializes more than |left|+|right| rows. Left rows with no prior
    * right row get nulls (left-outer semantics).
    *
    * `right` must be unique per (key, ts) — pre-aggregate if not (ties at
    * identical timestamps have no defined winner in any asof engine).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightPayload: Seq[String]): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    val collisions = leftExtra.toSet.intersect(rightPayload.toSet)
    require(collisions.isEmpty,
      s"rightPayload collides with left columns (rename one side): $collisions")
    // The payload travels as ONE struct per right row (never null on the
    // right side, even when every payload FIELD is null), and the window
    // takes the running last() of that struct — so the operator matches
    // the latest right ROW and returns that row's values, nulls included.
    // Folding each payload column independently would skip a legitimately
    // NULL value and attach an OLDER row's value — and with several payload
    // columns could stitch together values from different right rows
    // (ADVICE r4; DuckDB/kdb ASOF semantics are match-the-row).
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        leftExtra.map(col) :+
        lit(null).cast(payloadType).as("__asof"): _*)
    // SQL join semantics: a NULL key or ts on the right matches NOTHING
    // (the DuckDB ASOF oracle's `=`/`>=` return NULL) — without this
    // filter a null-ts right row sorts nulls-first and its payload would
    // attach to every left row with no earlier match. Left-side NULLs need
    // no handling: a null key partitions with no (filtered) right rows and
    // a null ts sorts before every right row, so the running last() is
    // null — exactly the ASOF LEFT JOIN's null-extension.
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
          leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightPayload.map(col): _*).as("__asof"): _*)
    // right rows sort BEFORE left rows at the same ts (side 0 < 1), so a
    // left row at T sees right rows with ts <= T inclusive — ASOF's `>=`
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++ leftExtra.map(col) ++
        rightPayload.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** ORDERED FUNNEL per user: for the stage sequence `stages`, stage i's
    * timestamp is the EARLIEST event of that type STRICTLY AFTER stage
    * i−1's timestamp (stage 0: the user's earliest such event); `depth` =
    * number of stages reached, contiguous by construction (a later stage
    * can only match after an earlier one did). The standard product-
    * analytics primitive (view → click → purchase conversion).
    *
    * Shape (the [[asofJoin]] lesson applied): NO per-stage join chain —
    * each stage is a conditional `min` WINDOW over the same user
    * partitioning, so the chain costs ONE hash shuffle on the user key
    * total (stacked Window operators reuse the exchange), and the final
    * per-user reduction rides the same partitioning. The naive k-stage
    * self-join pipeline shuffles the event table k+1 times.
    */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    stages.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(tsCol) > col(s"__t${i - 1}")
      df = df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    val depth = stages.indices
      .map(i => when(col(s"__t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("__depth", depth)
      .groupBy(col(userCol))
      .agg(max(col("__depth")).as("depth"))
  }

  /** EXACT rolling N-day active users: for every window-END day D, the
    * distinct users active in (D−N+1 .. D]. Distinct-over-a-sliding-
    * window is not window-function-expressible (COUNT(DISTINCT) OVER a
    * range is unsupported in every engine for good reason); the
    * scale-correct formulation is the FAN-OUT: activity collapses to
    * distinct (user, day) first — user×days, not events — then each
    * activity day contributes to the N window-ends it falls inside
    * (map-side ×N explode of the already-collapsed frame), and one
    * (day → distinct user) aggregate finishes. Window-ends up to N−1
    * days past the last activity are emitted (their windows still
    * contain activity) — the oracle replays the same rule.
    */
  def rollingActiveUsers(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val ud = events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    ud.select(col(userCol),
        explode(sequence(col("__day"), date_add(col("__day"), windowDays - 1)))
          .as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** COHORT RETENTION: users are cohorted by the hour of their FIRST
    * event; `n_active` counts distinct cohort members active k hours
    * later, for k in [0, maxOffset]. Shape: one keyed min (first event),
    * one distinct over (user, hour) — map-side-combinable, the activity
    * table shrinks to user×hours before the join — then an equi-join on
    * the user key and one (cohort, k) aggregate. k=0 is the cohort size
    * (every member is active in their own first hour), so retention
    * rates are n_active(k) / n_active(0) downstream.
    */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0)
    val firstH = events.groupBy(col(userCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("cohort_hour"))
    val active = events
      .select(col(userCol), date_trunc("hour", col(tsCol)).as("__h"))
      .distinct()
    active.join(firstH, userCol)
      .withColumn("k",
        ((unix_timestamp(col("__h")) - unix_timestamp(col("cohort_hour"))) / 3600L)
          .cast("int"))
      .filter(col("k") >= 0 && col("k") <= maxOffset)
      .groupBy(col("cohort_hour"), col("k"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
