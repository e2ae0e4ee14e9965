package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixedPoint: the symmetric 2-cycle is a fixed point at any iteration count") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    for (k <- Seq(1, 3)) {
      val got = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // r0 = 10^12 div 2 = 5e11; tele = 1.5e13 div 200 = 7.5e10;
      // inflow = (5e11 · 85) div 100 = 4.25e11 → 5e11 again, every round
      assert(got === Map("a" -> 500000000000L, "b" -> 500000000000L),
        s"iteration $k broke the fixed point")
    }
  }

  test("pageRankFixedPoint: hand-computed 2 iterations with a dangling node") {
    // a→b, a→c, b→a; c dangles (contributes nothing, keeps its teleport+inflow)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=3: r0 = 333333333333 each; tele = 1.5e13 div 300 = 5e10
    // it1: a ← (r0·85) div 100          = 283333333333 → 333333333333
    //      b,c ← (r0·85) div 200        = 141666666666 → 191666666666
    // it2: a ← (191666666666·85) div 100 = 162916666666 → 212916666666
    //      b,c ← (333333333333·85) div 200 = 141666666666 → 191666666666
    assert(got === Map(
      "a" -> 212916666666L,
      "b" -> 191666666666L,
      "c" -> 191666666666L))
  }

  test("pageRankWeightedFixedPoint: equal weights reproduce the unweighted ranks exactly") {
    // wn = (w·1000) div (2w) = 500 per edge — the same split the
    // unweighted form's deg=2 produces, so ranks must match bit-for-bit
    val ew = Seq(("a", "b", 7L), ("a", "c", 7L), ("b", "a", 7L), ("c", "a", 7L))
      .toDF("src", "dst", "w")
    val e = ew.select($"src", $"dst")
    val weighted = Graph.pageRankWeightedFixedPoint(ew, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unweighted = Graph.pageRankFixedPoint(e, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weighted === unweighted)
  }

  test("pageRankWeightedFixedPoint: hand-computed iteration with 3:1 weight split") {
    // a→b w=3, a→c w=1 (wn 750/250), b→a w=1 (wn 1000); c dangles
    val ew = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankWeightedFixedPoint(ew, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r0 = 333333333333; damped = (r0·85) div 100 = 283333333333; tele = 5e10
    // b ← damped·750 div 1000 = 212499999999 → 262499999999
    // c ← damped·250 div 1000 =  70833333333 → 120833333333
    // a ← damped·1000 div 1000 = 283333333333 → 333333333333
    assert(got === Map(
      "a" -> 333333333333L,
      "b" -> 262499999999L,
      "c" -> 120833333333L))
  }
}
