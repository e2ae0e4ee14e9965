package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result on a skewed key set") {
    // 90% of probe rows share one hot key
    val probe = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val build = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(probe, build, "k", saltBuckets = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    assert(salted.count() === plain.count())
  }

  test("skewReport: closed-form shares and skew factors, heaviest first") {
    // key 7 → 6 rows, key 1 → 3, key 2 → 1: total 10, 3 keys, mean 10/3
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(1L) ++ Seq(2L)).toDF("k")
    val got = Skew.skewReport(df, "k", topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (7L, 6L, 0.6, 1.8, 10L, 3L),   // 6/10; 6·3/10
      (1L, 3L, 0.3, 0.9, 10L, 3L)))
  }

  test("salt is deterministic: running twice gives identical assignments") {
    val probe = (1 to 100).map(i => (i.toLong % 5, i)).toDF("k", "v")
    val build = (0L until 5L).map(k => (k, s"d$k")).toDF("k", "name")
    val a = Skew.saltedJoin(probe, build, "k").orderBy("v").collect()
    val b = Skew.saltedJoin(probe, build, "k").orderBy("v").collect()
    assert(a.toSeq === b.toSeq)
  }
}
