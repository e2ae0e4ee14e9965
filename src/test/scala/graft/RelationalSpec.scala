package graft

import org.apache.spark.sql.functions._

/** Specs for query-battery semantics not covered by the DuckDB oracle gate. */
class RelationalSpec extends SparkSpec {

  test("approx_count_distinct lands within the configured error of exact") {
    val rows = SparkEntry.queries("q51_approx_distinct")(spark, sf("sf0.01"))
      .collect()
    assert(rows.nonEmpty)
    val exact = Tables.orders(spark, sf("sf0.01"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("e"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"HLL estimate drifted >5% for ${r.getString(0)}")
      assert(r.getAs[Long]("exact_custs") === exact(r.getString(0)))
    }
  }

  test("rollup emits leaf, subtotal, and grand-total grains") {
    val rows = SparkEntry.queries("q49_rollup_counts")(spark, sf("sf0.001")).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === 25L, "25 nations total")
    val regionSubtotals = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(regionSubtotals.map(_.getAs[Long]("n")).sum === 25L)
  }
}
