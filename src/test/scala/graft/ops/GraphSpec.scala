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

  test("pageRankConverged: probe stops at the measured round, after 3 rounds provably not converged") {
    // q136's planted graph: cyclic and deep enough that the rank deltas
    // after 3 rounds are far above eps
    val fixture = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("e", "a"), ("f", "a"))
    val eps = 20000000000L
    val (refRanks, refRounds) = Graph.pageRankConvergedReference(fixture, eps, 60)
    assert(refRounds > 3, s"fixture converged in $refRounds rounds — too shallow to gate the probe")
    val run = Graph.pageRankConverged(fixture.toDF("src", "dst"), "src", "dst",
      eps = eps, maxIterations = 60)
    assert(run.rounds === refRounds)
    assert(run.converged)
    assert(run.maxDelta <= eps)
    val got = run.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refRanks)
    // and the 3-round cap is NOT the converged answer: under-convergence
    // is observable, which is why the probe exists
    val capped = Graph.pageRankFixedPoint(fixture.toDF("src", "dst"), "src", "dst",
      iterations = 3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped !== got)
  }

  test("pageRankConverged with eps = 0 reproduces the k-iteration ranks bit-for-bit") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    val run = Graph.pageRankConverged(edges, "src", "dst", eps = 0L, maxIterations = 2)
    assert(run.rounds === 2 && !run.converged)
    val got = run.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fixed = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === fixed)
  }

  test("pageRankWeightedFixedPoint drops non-positive-weight edges but keeps their nodes") {
    // d→a carries w=0: no mass flows, but d stays a (teleport-ranked)
    // node — and no NULL __wn can zero out a's inflow (ADVICE r8)
    val base = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val withZero = (Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("d", "a", 0L)))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankWeightedFixedPoint(withZero, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set("a", "b", "c", "d"))
    // N=4: r0 = 250000000000, damped = 212500000000, tele = 37500000000
    // a ← b's full split: 212500000000 → 250000000000; d ← tele only
    assert(got("a") === 250000000000L)
    assert(got("d") === 37500000000L)
    // and zero-weight edges contribute exactly nothing: same graph with
    // the edge deleted gives the same a/b/c ranks shifted only by N
    val base3 = Graph.pageRankWeightedFixedPoint(base, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base3.keySet === Set("a", "b", "c"))
  }

  test("pageRank operators leave no cached plans behind") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c")).toDF("src", "dst")
    val ew = Seq(("a", "b", 2L), ("b", "a", 1L)).toDF("src", "dst", "w")
    Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 2).collect()
    Graph.pageRankWeightedFixedPoint(ew, "src", "dst", "w", iterations = 2).collect()
    Graph.pageRankConverged(edges, "src", "dst", eps = 0L, maxIterations = 2).ranks.collect()
    Graph.pageRankWeightedConverged(ew, "src", "dst", "w",
      eps = 0L, maxIterations = 2).ranks.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a pageRank variant left persisted plans in the cache manager")
  }

  test("pageRankWeightedConverged: probe stops at the measured round; weighting changes the answer") {
    // q139's planted graph: PrEdges' topology with asymmetric weights and
    // one zero-weight edge (f→b) exercising the w ≤ 0 drop inside the loop
    val fixture = Seq(
      ("a", "b", 5L), ("b", "c", 7L), ("c", "a", 10L), ("c", "d", 1L),
      ("d", "e", 4L), ("e", "a", 9L), ("f", "a", 2L), ("f", "b", 0L))
    val eps = 20000000000L
    val (refRanks, refRounds) = Graph.pageRankWeightedConvergedReference(fixture, eps, 60)
    assert(refRounds > 3, s"fixture converged in $refRounds rounds — too shallow to gate the probe")
    val run = Graph.pageRankWeightedConverged(fixture.toDF("src", "dst", "w"),
      "src", "dst", "w", eps = eps, maxIterations = 60)
    assert(run.rounds === refRounds)
    assert(run.converged && run.maxDelta <= eps)
    val got = run.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refRanks)
    // the unweighted converged ranks differ: the weighting is load-bearing
    val unweighted = Graph.pageRankConverged(
      fixture.map(e => (e._1, e._2)).toDF("src", "dst"), "src", "dst",
      eps = eps, maxIterations = 60)
      .ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got !== unweighted)
  }

  test("pageRankWeightedConverged with eps = 0 reproduces the weighted k-iteration ranks bit-for-bit") {
    val ew = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val run = Graph.pageRankWeightedConverged(ew, "src", "dst", "w",
      eps = 0L, maxIterations = 2)
    assert(run.rounds === 2 && !run.converged)
    val got = run.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fixed = Graph.pageRankWeightedFixedPoint(ew, "src", "dst", "w", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === fixed)
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

  test("labelPropagation separates two cliques; distributed run equals the pure replay") {
    // 4-clique + triangle + bridge + pendant (the q168 fixture topology)
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
      ("a2", "a4"), ("a3", "a4"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a1", "b1"), ("b2", "c1"))
    val run = Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst")
    val got = run.labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val (ref, refRounds, refConverged) = Graph.labelPropagationReference(edges)
    assert(got === ref, "distributed labels must equal the pure-Scala replay")
    assert(run.rounds === refRounds && run.converged === refConverged)
    // the two cliques end under one label each, and those labels differ
    assert(Set("a2", "a3", "a4").map(got) === Set(got("a2")))
    assert(Set("b1", "b3").map(got) === Set(got("b1")))
    assert(got("a2") !== got("b1"), "bridge must not merge the communities")
    assert(spark.sharedState.cacheManager.isEmpty,
      "labelPropagation left persisted plans behind")
  }

  test("triangleStats: hand-computed counts and coefficients on the fixture graph") {
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
      ("a2", "a4"), ("a3", "a4"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a1", "b1"), ("b2", "c1"))
    val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // K4 interiors: deg 3, 3 triangles, fully clustered
    Seq("a2", "a3", "a4").foreach(n => assert(got(n) === ((3L, 3L, 1.0)), n))
    // bridge corner: deg 4 (K4 + b1), still only the K4's 3 triangles
    assert(got("a1") === ((4L, 3L, 0.5)))
    // triangle side with the extra bridge/pendant edges
    assert(got("b1") === ((3L, 1L, 0.3333)))
    assert(got("b2") === ((3L, 1L, 0.3333)))
    assert(got("b3") === ((2L, 1L, 1.0)))
    // pendant: no wedge possible
    assert(got("c1") === ((1L, 0L, 0.0)))
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangleStats left persisted plans behind")
  }

  test("kCore peels to the K4 at k=3; a chain peels to nothing; replay agrees") {
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
      ("a2", "a4"), ("a3", "a4"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a1", "b1"), ("b2", "c1"))
    val run = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k = 3)
    val got = run.nodes.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the K4 survives with its internal degrees; the bridge edge to the
    // peeled b1 is gone, so a1 is back to degree 3
    assert(got === Map("a1" -> 3L, "a2" -> 3L, "a3" -> 3L, "a4" -> 3L))
    assert(run.converged)
    val (ref, refRounds, refConv) = Graph.kCoreReference(edges, k = 3)
    assert(got === ref.map { case (n, d) => n -> d.toLong })
    assert(run.rounds === refRounds && run.converged === refConv)
    // a pure chain has no 2-core at all — peels from both ends to empty
    val chain = Seq(("x1", "x2"), ("x2", "x3"), ("x3", "x4")).toDF("src", "dst")
    assert(Graph.kCore(chain, "src", "dst", k = 2).nodes.count() === 0L)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("coreness is consistent with every kCore cut, and phases leave no cached plans") {
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
      ("a2", "a4"), ("a3", "a4"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a1", "b1"), ("b2", "c1"))
    val df = edges.toDF("src", "dst")
    val core = Graph.coreness(df, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(core === Map(
      "a1" -> 3, "a2" -> 3, "a3" -> 3, "a4" -> 3,
      "b1" -> 2, "b2" -> 2, "b3" -> 2, "c1" -> 1))
    // cross-check the defining property: {coreness >= k} == kCore(k)
    (1 to 3).foreach { k =>
      val viaCut = Graph.kCore(df, "src", "dst", k).nodes
        .collect().map(_.getString(0)).toSet
      assert(core.filter(_._2 >= k).keySet === viaCut, s"k=$k")
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("labelPropagation: a 2-node oscillator hits the cap and reports non-convergence") {
    val edges = Seq(("x", "y")).toDF("src", "dst")
    val run = Graph.labelPropagation(edges, "src", "dst", maxIterations = 6)
    assert(run.rounds === 6 && !run.converged && run.nChanged === 2L,
      s"expected a swap cycle: rounds=${run.rounds} converged=${run.converged} changed=${run.nChanged}")
    // the replay agrees on the oscillation
    val (_, refRounds, refConverged) =
      Graph.labelPropagationReference(Seq(("x", "y")), maxIterations = 6)
    assert(refRounds === 6 && !refConverged)
  }
}
