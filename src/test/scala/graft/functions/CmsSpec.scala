package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the [[CmsEstimate]] probe: the hash contract with Spark's
  * `stat.countMinSketch` builder, the structural no-underestimate
  * guarantee, null semantics, and eval/codegen agreement.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("never underestimates: every inserted string's estimate >= its true count") {
    // skewed multiset: token i occurs i+1 times
    val rows = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"token$i"))
    val df = rows.toDF("v")
    val cms = df.stat.countMinSketch(col("v"), 0.01, 0.95, 7)
    val bytes = CmsExprs.serialize(cms)
    val checked = df.distinct()
      .withColumn("est", CmsExprs.cms_estimate(col("v"), bytes))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      assert(checked(s"token$i") >= (i + 1).toLong,
        s"token$i estimated below its true count")
    }
  }

  test("null value estimates to null; absent keys may overestimate but never go negative") {
    val bytes = CmsExprs.serialize(
      Seq("a", "b", "a").toDF("v").stat.countMinSketch(col("v"), 0.01, 0.95, 7))
    val probed = Seq(Some("a"), None, Some("zzz")).toDF("v")
      .select(CmsExprs.cms_estimate(col("v"), bytes)).collect()
    assert(probed(0).getLong(0) >= 2L)
    assert(probed(1).isNullAt(0))
    assert(probed(2).getLong(0) >= 0L)
  }

  test("whole-stage codegen and interpreted eval agree") {
    val df = (0 until 30).map(i => s"w$i").toDF("v")
    val bytes = CmsExprs.serialize(df.stat.countMinSketch(col("v"), 0.01, 0.95, 7))
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("v"), CmsExprs.cms_estimate(col("v"), bytes))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }
}
