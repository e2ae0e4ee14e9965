package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the mergeable-sketch aggregates ([[KllAgg]], [[ThetaAgg]] —
  * the repo's TypedImperativeAggregates) and their serving probes:
  *
  *  - exactness in the sub-k regime (KLL performs no compaction until
  *    n > k, so small inputs are EXACT and deterministic — the regime
  *    the closed-form assertions use),
  *  - partition invariance (the property the gates' certificates lean
  *    on: theta compact bytes are a pure function of the distinct set;
  *    KLL sub-k results survive any split),
  *  - the plan shape: partial + final ObjectHashAggregate with only the
  *    binary sketch crossing the exchange — the 100 TB argument,
  *  - theta set algebra against exact counts, union idempotence (the
  *    streaming replay contract), and the KLL merge helper the
  *    streaming quantile sink folds with.
  */
class SketchAggsSpec extends SparkSpec {
  import spark.implicits._

  private def kllBytes(df: org.apache.spark.sql.DataFrame, k: Int = 200): Array[Byte] =
    df.agg(call_function("kll_agg", col("v").cast("double"), lit(k)).as("sk"))
      .head().getAs[Array[Byte]]("sk")

  test("kll_agg is exact below k: every quantile is a retained item at the inclusive rank") {
    // 100 values, k=200 → no compaction, sketch holds the sorted multiset
    val vals = (1 to 100).map(_.toDouble)
    val bytes = kllBytes(vals.toDF("v").repartition(7))
    assert(SketchAggs.kllN(bytes) == 100L)
    // inclusive quantile at rank q = smallest item with rank*n >= q*n
    assert(SketchAggs.kllQuantile(bytes, 0.5) == 50.0)
    assert(SketchAggs.kllQuantile(bytes, 0.01) == 1.0)
    assert(SketchAggs.kllQuantile(bytes, 1.0) == 100.0)
    assert(SketchAggs.kllRank(bytes, 50.0) == 0.5)
  }

  test("kll_agg ignores nulls and repartitioning does not change sub-k results") {
    val df = Seq[Option[Int]](Some(1), None, Some(2), Some(3), None)
      .toDF("v")
    val a = kllBytes(df.repartition(1))
    val b = kllBytes(df.repartition(5))
    assert(SketchAggs.kllN(a) == 3L && SketchAggs.kllN(b) == 3L)
    Seq(0.25, 0.5, 1.0).foreach(q =>
      assert(SketchAggs.kllQuantile(a, q) == SketchAggs.kllQuantile(b, q)))
  }

  test("kll merge helper adds weight (NOT idempotent) — the streaming guard's reason to exist") {
    val a = kllBytes(Seq(1, 2, 3).toDF("v"))
    val merged = SketchAggs.kllMerge(a, a)
    assert(SketchAggs.kllN(merged) == 6L,
      "KLL merge must double-count a re-merged sketch; replay safety is the batch-id guard")
  }

  test("kll_agg plans as partial+final ObjectHashAggregate (sketch bytes cross the exchange)") {
    val df = (1 to 50).toDF("v")
    val plan = df.agg(call_function("kll_agg", col("v").cast("double"), lit(200)))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(plan.contains("partial_kll_agg"), s"no map-side partial in:\n$plan")
  }

  test("grouped kll_agg: per-key sketches are sub-k exact and still plan partial+final") {
    val df = (1 to 90).map(i => (s"g${i % 3}", i)).toDF("g", "v").repartition(5)
    val agg = df.groupBy(col("g"))
      .agg(call_function("kll_agg", col("v").cast("double"), lit(200)).as("sk"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kll_agg"), s"no map-side partial in:\n$plan")
    val sks = agg.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    // group g0 = {3,6,...,90}: 30 values, median (inclusive, rank .5) = 45
    assert(SketchAggs.kllN(sks("g0")) == 30L)
    assert(SketchAggs.kllQuantile(sks("g0"), 0.5) == 45.0)
    assert(SketchAggs.kllQuantile(sks("g1"), 1.0) == 88.0)
  }

  test("theta compact bytes are a pure function of the distinct set (order/partition/dup invariant)") {
    val base = (1 to 1000).map(i => s"tok$i")
    val a = base.toDF("v").repartition(3)
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // reversed order, different partitioning, every element duplicated
    val b = (base.reverse ++ base).toDF("v").repartition(11)
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(a, b),
      "theta sketch bytes must depend only on the distinct input set")
    assert(SketchAggs.thetaEstimate(a) == 1000.0, "exact mode below k=4096")
  }

  test("theta set algebra matches exact counts in exact mode; union is idempotent") {
    def sk(xs: Seq[Int]): Array[Byte] =
      xs.map(i => s"t$i").toDF("v")
        .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    val a = sk(1 to 600) // A = [1,600]
    val b = sk(401 to 1000) // B = [401,1000]; A∩B = [401,600]
    assert(SketchAggs.thetaIntersectEstimate(a, b) == 200.0)
    assert(SketchAggs.thetaAnotBEstimate(a, b) == 400.0)
    assert(SketchAggs.thetaAnotBEstimate(b, a) == 400.0)
    assert(SketchAggs.thetaEstimate(SketchAggs.thetaUnion(a, b, 12)) == 1000.0)
    // idempotence: re-unioning an absorbed sketch moves nothing —
    // byte-level, the streaming replay contract
    val once = SketchAggs.thetaUnion(a, b, 12)
    val twice = SketchAggs.thetaUnion(once, b, 12)
    assert(java.util.Arrays.equals(once, twice))
  }

  test("theta estimation mode carries its RSE contract on a 50k-distinct set") {
    val n = 50000
    val bytes = (1 to n).map(i => s"u$i").toDF("v").repartition(8)
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val est = SketchAggs.thetaEstimate(bytes)
    val rse = 1.0 / math.sqrt((1 << 12) - 1.0)
    assert(math.abs(est - n) <= 4.0 * rse * n,
      s"estimate $est outside 4×RSE of $n")
  }

  test("kll_merge_agg rollup of disjoint shards equals the direct sketch below k") {
    // 4 shards of 25 values each; total 100 < k=200 → rollup is exact
    val shards = (1 to 100).map(i => (s"s${i % 4}", i)).toDF("shard", "v")
    val rolled = shards.groupBy(col("shard"))
      .agg(call_function("kll_agg", col("v").cast("double"), lit(200)).as("sk"))
      .agg(call_function("kll_merge_agg", col("sk"), lit(200)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(SketchAggs.kllN(rolled) == 100L)
    assert(SketchAggs.kllQuantile(rolled, 0.5) == 50.0)
    assert(SketchAggs.kllQuantile(rolled, 1.0) == 100.0)
    // weight-adding semantics: rolling up an OVERLAPPING shard double-counts
    // (by design — the reason the streaming guard exists)
    val over = shards.limit(0).union(shards).union(shards.filter(col("shard") === "s0"))
      .groupBy(col("shard")).agg(
        call_function("kll_agg", col("v").cast("double"), lit(200)).as("sk"))
    // s0 shard appears twice in the input rows → its 25 values count twice
    val overRolled = over
      .agg(call_function("kll_merge_agg", col("sk"), lit(200)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(SketchAggs.kllN(overRolled) == 125L)
  }

  test("theta_union_agg rollup equals the direct sketch byte-for-byte; overlap is free") {
    val toks = (1 to 800).map(i => (s"s${i % 3}", s"tok$i")).toDF("shard", "v")
    val rolled = toks.groupBy(col("shard"))
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .agg(call_function("theta_union_agg", col("sk"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val direct = toks
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(rolled, direct),
      "theta rollup must equal the direct sketch (pure function of the set)")
    // set semantics: OVERLAPPING shards roll up without double-counting —
    // the exact property KLL merge lacks
    val overlapped = toks.union(toks.filter(col("shard") === "s0"))
      .groupBy(col("shard"))
      .agg(call_function("theta_agg", col("v"), lit(12)).as("sk"))
      .agg(call_function("theta_union_agg", col("sk"), lit(12)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(overlapped, direct))
  }

  test("probe expressions null-propagate and reject wrong input types") {
    val nullRow = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("sk")
    assert(nullRow.select(call_function("kll_n", col("sk"))).head().isNullAt(0))
    assert(nullRow.select(call_function("theta_estimate", col("sk"))).head().isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("v").select(call_function("kll_quantile", col("v"), lit(0.5))).collect()
    }
    assert(err.getMessage.contains("kll_quantile"))
  }

  test("SQL registry serves the sketch functions end to end") {
    (1 to 30).map(i => (i, s"w${i % 7}")).toDF("n", "w").createOrReplaceTempView("sk_t")
    val row = spark.sql(
      """SELECT kll_quantile(kll_agg(CAST(n AS DOUBLE), 64), 0.5d) AS med,
        |  theta_estimate(theta_agg(w, 10)) AS nd
        |FROM sk_t""".stripMargin).head()
    assert(row.getDouble(0) == 15.0)
    assert(row.getDouble(1) == 7.0)
    spark.catalog.dropTempView("sk_t")
  }

  test("cms_merge_agg rollup of disjoint shards equals the direct sketch byte-for-byte") {
    // CMS is fully deterministic (hash-cell sums), so unlike KLL the
    // rollup-vs-direct contract here is BYTE equality, not error bands
    val rows = (1 to 400).map(i => (i % 4, s"tok${i % 23}")).toDF("shard", "v")
    val direct = rows.select(
      count_min_sketch(col("v"), lit(0.01), lit(0.9), lit(7)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val rolled = rows.groupBy(col("shard"))
      .agg(count_min_sketch(col("v"), lit(0.01), lit(0.9), lit(7)).as("sk"))
      .agg(call_function("cms_merge_agg", col("sk")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(rolled, direct))
    // and the per-row probe serves the same estimates as the foldable one
    val probe = Seq("tok1", "tok22", "absent").toDF("value")
      .withColumn("sk", lit(rolled))
    val perRow = probe.select(call_function(
        "cms_estimate_row", col("value"), col("sk")).as("est"))
      .collect().map(_.getLong(0)).toSeq
    val foldable = Seq("tok1", "tok22", "absent").toDF("value")
      .select(graft.functions.CmsExprs.cms_estimate(col("value"), rolled).as("est"))
      .collect().map(_.getLong(0)).toSeq
    assert(perRow === foldable)
    // structural no-underestimate on a present token; exact here (no
    // collisions at this width over 23 distinct tokens)
    assert(perRow.head >= 400L / 23)
  }

  test("cms_merge_agg refuses mixed-shape constituents; empty group is NULL") {
    val a = Seq("x").toDF("v")
      .select(count_min_sketch(col("v"), lit(0.01), lit(0.9), lit(7)).as("sk"))
    val b = Seq("x").toDF("v")
      .select(count_min_sketch(col("v"), lit(0.1), lit(0.9), lit(7)).as("sk"))
    val err = intercept[Exception] {
      a.unionByName(b).coalesce(1)
        .agg(call_function("cms_merge_agg", col("sk"))).collect()
    }
    assert(err.getMessage.contains("shapes") ||
      Option(err.getCause).exists(_.getMessage.contains("shapes")))
    val empty = a.filter(org.apache.spark.sql.functions.lit(false))
      .agg(call_function("cms_merge_agg", col("sk"))).head()
    assert(empty.isNullAt(0), "empty group must evaluate to NULL (no shape to adopt)")
  }
}
