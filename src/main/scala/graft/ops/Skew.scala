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
}
