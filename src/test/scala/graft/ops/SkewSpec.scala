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

  test("salt is deterministic: running twice gives identical assignments") {
    val probe = (1 to 100).map(i => (i.toLong % 5, i)).toDF("k", "v")
    val build = (0L until 5L).map(k => (k, s"d$k")).toDF("k", "name")
    val a = Skew.saltedJoin(probe, build, "k").orderBy("v").collect()
    val b = Skew.saltedJoin(probe, build, "k").orderBy("v").collect()
    assert(a.toSeq === b.toSeq)
  }
}
