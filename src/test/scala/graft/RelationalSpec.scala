package graft

import org.apache.spark.sql.functions._

/** Specs for query-battery semantics not covered by the DuckDB oracle gate. */
class RelationalSpec extends SparkSpec {

  test("approx_count_distinct lands within the configured error of exact") {
    val df = SparkEntry.queries("q51_approx_distinct")(spark, sf("sf0.01"))
    val exact = Tables.orders(spark, sf("sf0.01"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
    val joined = df.join(exact, "o_orderpriority")
      .select(col("approx_custs").cast("double"), col("exact_custs").cast("double"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getDouble(0), r.getDouble(1))
      val relErr = math.abs(a - e) / e
      assert(relErr < 0.08, s"approx=$a exact=$e relErr=$relErr")
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
