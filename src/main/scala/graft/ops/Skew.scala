package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (the canonical 100 TB failure: one hot key lands an entire
  * shuffle partition on one executor).
  *
  * AQE's skew-join split handles sort-merge joins after the fact
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in GraftSession);
  * [[saltedJoin]] is the explicit form for when the build side is small
  * enough to replicate but too big to broadcast, or when AQE cannot see the
  * skew (e.g. post-aggregation keys).
  */
object Skew {

  /** Salted equi-join: the probe (large, skewed) side gets a
    * deterministic salt in [0, n) derived from a row-stable hash — NOT a
    * random salt, so retries/speculative tasks stay consistent — while the
    * build side is replicated n× with every salt value. The join key
    * becomes (key, salt), splitting each hot key across n shuffle
    * partitions.
    *
    * `joinType` may be `inner` (default) or `left`/`left_outer`: because
    * the salt is attached to each probe row exactly ONCE (only the build
    * side replicates), a probe row with no build match survives the left
    * join exactly once — replication cannot duplicate or drop unmatched
    * probe rows, so the salted left join is row-for-row the plain left
    * join (q137 gates this against the unsalted SQL). Right/full joins
    * are NOT offered: there the build side's unmatched rows appear once
    * per salt replica and would need a post-join dedup.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 8, saltOn: Column = null,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltSrc = Option(saltOn).getOrElse(xxhash64(probe.columns.map(col).toSeq: _*))
    val p = probe.withColumn("__salt", pmod(saltSrc, lit(saltBuckets)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** PRE-FLIGHT skew report for a join/aggregation key — the diagnostic
    * that decides between a plain shuffle, [[saltedJoin]], and AQE's
    * skew split, run BEFORE the expensive job instead of diagnosed from
    * its straggler afterwards: the `topK` heaviest keys with their row
    * share, each carrying the key-space context (total rows, distinct
    * keys, mean rows/key) and `skew_factor` = key count ÷ mean — the
    * replication factor a salted join would need to level that key.
    *
    * Scale shape: ONE map-side-combinable (key → count) aggregate (the
    * exact shuffle the real job would do, minus the payload), a
    * TakeOrderedAndProject for the top-k, and the 1-row totals frame as a
    * broadcast scalar subquery (q24 cap pattern). Exact integer counts;
    * each derived double is one rounded division (q79's rule).
    */
  def skewReport(
      df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum(col("n_rows")).cast("long").as("__total"),
      count(lit(1)).as("__keys"))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("share",
        round(col("n_rows").cast("double") / col("__total").cast("double"), 4))
      .withColumn("skew_factor",
        round(col("n_rows").cast("double") * col("__keys").cast("double") /
          col("__total").cast("double"), 4))
      .select(col(keyCol), col("n_rows"), col("share"), col("skew_factor"),
        col("__total").as("total_rows"), col("__keys").as("n_keys"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topK)
  }

  /** The DECISION [[skewReport]] feeds — r8 shipped the diagnostic but
    * nothing consumed it (VERDICT r8 next #7). Appends to each report row
    * the shuffle strategy the reported frame should use on that key and
    * the salt replication a salted run would take, as a pure row-local
    * rule the oracle replays verbatim:
    *
    *  - `broadcast` when the whole frame fits the broadcast bar
    *    (`total_rows` ≤ `broadcastRowLimit`) — no shuffle at all beats
    *    any salting;
    *  - else `salted` when the key's `skew_factor` ≥ `skewFactorBar` —
    *    that key's partition would run `skew_factor`× the mean straggler;
    *    `salt_buckets` = ⌈skew_factor⌉ clamped to [2, maxSaltBuckets]
    *    (the replication that levels the key back to ~mean);
    *  - else `plain` — an even key space needs nothing.
    *
    * Thresholds are parameters, not policy baked in: the broadcast bar is
    * a row-count proxy for `spark.sql.autoBroadcastJoinThreshold` (bytes
    * aren't visible to a report), and the skew bar is where AQE's
    * `skewedPartitionFactor` (default 5) sits on the same axis.
    */
  def joinDecision(
      report: DataFrame, broadcastRowLimit: Long = 10000000L,
      skewFactorBar: Double = 4.0, maxSaltBuckets: Int = 32): DataFrame = {
    require(broadcastRowLimit >= 0 && skewFactorBar > 0 && maxSaltBuckets >= 2)
    report
      .withColumn("strategy",
        when(col("total_rows") <= broadcastRowLimit, lit("broadcast"))
          .when(col("skew_factor") >= skewFactorBar, lit("salted"))
          .otherwise(lit("plain")))
      .withColumn("salt_buckets",
        when(col("strategy") === "salted",
          least(greatest(ceil(col("skew_factor")).cast("int"), lit(2)),
            lit(maxSaltBuckets)))
          .otherwise(lit(1)))
  }

  /** What [[adaptiveJoin]] decided and why — returned beside the frame so
    * callers (and the gate) can assert the dispatched path instead of
    * trusting it.
    */
  final case class JoinChoice(
      strategy: String, saltBuckets: Int, buildRows: Long, topSkewFactor: Double)

  /** The CLOSED loop over [[skewReport]] → [[joinDecision]] →
    * [[saltedJoin]] (VERDICT r11 next #3 — r8 shipped the diagnostic, r11
    * the decision, and until now the builder still picked the strategy by
    * hand per query): ONE entry point that measures and dispatches.
    *
    *  - `broadcast` when the BUILD side's row count fits
    *    `broadcastRowLimit` (a row-count proxy for
    *    `spark.sql.autoBroadcastJoinThreshold` — no shuffle at all beats
    *    any salting, and the build side is what broadcasting replicates;
    *    [[joinDecision]]'s frame-level bar is reinterpreted accordingly
    *    here, since a join has two sides);
    *  - else `salted` when the probe's heaviest key carries a
    *    `skew_factor` ≥ `skewFactorBar` ([[joinDecision]]'s rule on the
    *    report's head row), with the decision's own `salt_buckets`;
    *  - else `plain` — an even key space needs nothing.
    *
    * Pre-flight cost: one count on the build side plus the report's one
    * map-combinable aggregate over the probe's KEY column only — both
    * strictly cheaper than the join they steer, and the report is the
    * exact shuffle the plain join would do minus the payload. The
    * decision drives a 1-row collect (bounded). All three paths are
    * row-for-row the plain join for `inner`/`left` (the [[saltedJoin]]
    * replication proof; SkewSpec pins each path's plan AND its
    * hash-equality to the plain join).
    */
  def adaptiveJoin(
      probe: DataFrame, build: DataFrame, key: String,
      joinType: String = "inner",
      broadcastRowLimit: Long = 10000000L,
      skewFactorBar: Double = 4.0,
      maxSaltBuckets: Int = 32): (DataFrame, JoinChoice) = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"adaptiveJoin supports inner/left joins only, got $joinType")
    val buildRows = build.count()
    if (buildRows <= broadcastRowLimit) {
      (probe.join(broadcast(build), Seq(key), joinType),
        JoinChoice("broadcast", 1, buildRows, 0.0))
    } else {
      // the report's head row IS the heaviest key; joinDecision's salt
      // sizing rule applied to it decides for the whole join (salting
      // levels the worst straggler — lighter keys only get less skewed)
      val head = joinDecision(
          skewReport(probe.select(col(key)), key, topK = 1),
          broadcastRowLimit = 0L, skewFactorBar = skewFactorBar,
          maxSaltBuckets = maxSaltBuckets)
        .select(col("strategy"), col("salt_buckets"), col("skew_factor"))
        .collect()
      head.headOption match {
        case Some(r) if r.getString(0) == "salted" =>
          val buckets = r.getInt(1)
          (saltedJoin(probe, build, key, buckets, joinType = joinType),
            JoinChoice("salted", buckets, buildRows, r.getDouble(2)))
        case Some(r) =>
          (probe.join(build, Seq(key), joinType),
            JoinChoice("plain", 1, buildRows, r.getDouble(2)))
        case None => // empty probe: any join shape returns its empty result
          (probe.join(build, Seq(key), joinType),
            JoinChoice("plain", 1, buildRows, 0.0))
      }
    }
  }
}
