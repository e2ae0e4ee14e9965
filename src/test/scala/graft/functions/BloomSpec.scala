package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the [[BloomMightContain]] probe: the hash contract with
  * Spark's `stat.bloomFilter` builder (no false negatives through a REAL
  * aggregate-built filter), null semantics, a loose false-positive bound,
  * and eval/codegen agreement.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBloom(values: Seq[String]) = {
    val bloom = values.toDF("v").stat.bloomFilter("v", 4096L, 0.03)
    BloomExprs.serialize(bloom)
  }

  test("no false negatives: every inserted string probes true") {
    val members = (0 until 500).map(i => s"shingle number $i")
    val bytes = buildBloom(members)
    val kept = members.toDF("v")
      .filter(BloomExprs.bloom_might_contain(col("v"), bytes))
      .count()
    assert(kept === 500L, "a bloom filter must never reject a member")
  }

  test("false positives are rare and the exact join kills them") {
    val members = (0 until 500).map(i => s"present $i")
    val bytes = buildBloom(members)
    val probes = (0 until 2000).map(i => s"absent $i").toDF("v")
    val fp = probes.filter(BloomExprs.bloom_might_contain(col("v"), bytes)).count()
    // fpp 3% at 4096 capacity, 500 inserted — allow generous slack
    assert(fp < 200L, s"false-positive rate implausibly high: $fp / 2000")
    // the composed guarantee: prefilter + exact semi-join == exact semi-join
    val exact = probes.join(members.toDF("v"), Seq("v"), "left_semi").count()
    val composed = probes
      .filter(BloomExprs.bloom_might_contain(col("v"), bytes))
      .join(members.toDF("v"), Seq("v"), "left_semi").count()
    assert(composed === exact)
  }

  test("null value probes to null (row dropped by a filter)") {
    val bytes = buildBloom(Seq("a", "b"))
    val df = Seq(Some("a"), None, Some("zzz")).toDF("v")
    assert(df.filter(BloomExprs.bloom_might_contain(col("v"), bytes)).count() === 1L)
    assert(df.select(BloomExprs.bloom_might_contain(col("v"), bytes))
      .collect().map(r => if (r.isNullAt(0)) "null" else r.getBoolean(0).toString)
      .toSeq === Seq("true", "null", "false") ||
      // 'zzz' may be a false positive; only the null slot is pinned exactly
      df.select(BloomExprs.bloom_might_contain(col("v"), bytes))
        .collect()(1).isNullAt(0))
  }

  test("whole-stage codegen and interpreted eval agree") {
    val members = (0 until 100).map(i => s"m$i")
    val bytes = buildBloom(members)
    val probes = ((0 until 100).map(i => s"m$i") ++ (0 until 100).map(i => s"x$i")).toDF("v")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try probes.select(col("v"), BloomExprs.bloom_might_contain(col("v"), bytes))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }
}
