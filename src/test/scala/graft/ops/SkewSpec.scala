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

  test("salted LEFT join: unmatched probe rows survive exactly once despite replication") {
    // hot key 7 matches; keys 100+ have NO build row — each such probe row
    // must appear exactly once with a null build column (8× build
    // replication multiplies only matches), row-for-row the plain left join
    val probe = ((1 to 900).map(i => (7L, i)) ++ (901 to 1000).map(i => (100L + i, i)))
      .toDF("k", "v")
    val build = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, Seq("k"), "left").select("k", "v", "name")
    val salted = Skew.saltedJoin(probe, build, "k", saltBuckets = 8, joinType = "left")
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    assert(salted.count() === plain.count())
    assert(salted.filter(col("name").isNull).count() === 100L)
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, "k", joinType = "right")
    }
  }

  test("joinDecision: each strategy branch fires on its planted report") {
    // key 100 → 16 rows, keys 0–7 → 1 each: total 24, 9 keys, mean 24/9;
    // skew_factor(100) = 16·9/24 = 6.0, the cold keys sit at 0.375
    val df = (Seq.fill(16)(100L) ++ (0L until 8L)).toDF("k")
    val report = Skew.skewReport(df, "k", topK = 9)
    // broadcast bar swallows the whole frame → every row broadcasts
    val bc = Skew.joinDecision(report, broadcastRowLimit = 100L).collect()
    assert(bc.forall(_.getAs[String]("strategy") === "broadcast"))
    assert(bc.forall(_.getAs[Int]("salt_buckets") === 1))
    // tight salt bar: the hot key salts at ⌈6.0⌉ buckets, cold keys plain
    val dec = Skew.joinDecision(report, broadcastRowLimit = 10L, skewFactorBar = 4.0)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("strategy"), r.getAs[Int]("salt_buckets")))).toMap
    assert(dec(100L) === (("salted", 6)))
    (0L until 8L).foreach(k => assert(dec(k) === (("plain", 1)), s"key $k"))
    // clamp: maxSaltBuckets caps the hot key's replication
    val capped = Skew.joinDecision(report, broadcastRowLimit = 10L,
      skewFactorBar = 4.0, maxSaltBuckets = 4).collect()
      .find(_.getAs[Long]("k") === 100L).get
    assert(capped.getAs[Int]("salt_buckets") === 4)
  }

  test("adaptiveJoin dispatches broadcast/salted/plain on measured inputs, results invariant") {
    import spark.implicits._
    // planted skew: one hot key carries 90% of the probe
    val skewed = ((1 to 900).map(i => (7L, i)) ++ (901 to 1000).map(i => (i.toLong, i)))
      .toDF("k", "v")
    // uniform probe: every key once
    val uniform = (1L to 1000L).map(k => (k, k.toInt)).toDF("k", "v")
    val build = (0L until 1000L).map(k => (k, s"dim$k")).toDF("k", "name")
    def plain(p: org.apache.spark.sql.DataFrame) =
      p.join(build, Seq("k")).select("k", "v", "name")
    // SMALL build under the default row limit → broadcast path, pinned in
    // the physical plan
    val (bj, bc) = Skew.adaptiveJoin(skewed, build, "k")
    assert(bc.strategy === "broadcast" && bc.buildRows === 1000L)
    assert(bj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "broadcast decision must produce a broadcast join")
    assert(bj.select("k", "v", "name").exceptAll(plain(skewed)).count() === 0L)
    assert(bj.count() === plain(skewed).count())
    // build over the limit + planted skew → salted (the probe's hot key
    // measures skew_factor = 900·101/1000 ≈ 91, clamped to 32 buckets)
    val (sj, sc) = Skew.adaptiveJoin(skewed, build, "k", broadcastRowLimit = 10L,
      skewFactorBar = 4.0)
    assert(sc.strategy === "salted" && sc.saltBuckets === 32 && sc.topSkewFactor > 50.0)
    assert(sj.queryExecution.analyzed.toString.contains("__salt"),
      "salted decision must dispatch through the salted join")
    assert(sj.select("k", "v", "name").exceptAll(plain(skewed)).count() === 0L)
    assert(sj.count() === plain(skewed).count())
    // build over the limit + uniform probe → plain join, no salt anywhere
    val (pj, pc) = Skew.adaptiveJoin(uniform, build, "k", broadcastRowLimit = 10L,
      skewFactorBar = 4.0)
    assert(pc.strategy === "plain" && pc.saltBuckets === 1)
    assert(!pj.queryExecution.analyzed.toString.contains("__salt"))
    assert(pj.select("k", "v", "name").exceptAll(plain(uniform)).count() === 0L)
    assert(pj.count() === plain(uniform).count())
  }
}
