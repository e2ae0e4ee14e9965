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

  /** Salted inner equi-join: the probe (large, skewed) side gets a
    * deterministic salt in [0, n) derived from a row-stable hash — NOT a
    * random salt, so retries/speculative tasks stay consistent — while the
    * build side is replicated n× with every salt value. The join key
    * becomes (key, salt), splitting each hot key across n shuffle
    * partitions.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 8, saltOn: Column = null): DataFrame = {
    val saltSrc = Option(saltOn).getOrElse(xxhash64(probe.columns.map(col).toSeq: _*))
    val p = probe.withColumn("__salt", pmod(saltSrc, lit(saltBuckets)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    p.join(b, Seq(key, "__salt"), "inner").drop("__salt")
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
}
