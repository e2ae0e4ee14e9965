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
}
