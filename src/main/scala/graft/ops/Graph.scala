package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the family member beyond
  * [[Dedup]]'s connected components: PageRank (Page et al. 1999) in a
  * FIXED-POINT integer form, used here to rank SOURCES over the
  * provenance/overlap graph (acquisition priority: a feed that strong,
  * well-connected feeds copy from outranks a leaf), but generic over any
  * (src, dst) edge frame.
  *
  * '''Why fixed-point.''' Float PageRank sums per-node contributions in
  * nondeterministic order — unhashable cross-engine (and unstable across
  * reruns). Ranks here are integer micro-units of `scale` (default 10¹²):
  * the initial rank is `scale div N`, the teleport term
  * `(scale·(dampDen−dampNum)) div (dampDen·N)`, and each edge carries
  * `(r·dampNum) div (dampDen·outdeg)` — ALL integral `div`s, so every
  * iteration is exact 64-bit arithmetic any engine reproduces bit-for-bit
  * (values stay < 10¹⁴, far under Long range; quantization error per term
  * is < 1 micro-unit = 10⁻¹² of total mass, irrelevant to ranking).
  * Dangling nodes (outdeg 0) contribute nothing — their damped mass is
  * dropped, the standard simplification; teleport keeps them ranked.
  *
  * '''Scale shape.''' Each iteration is one edges⋈ranks equi-join keyed on
  * the source node + one map-combinable sum keyed on the destination — the
  * connected-components round shape; k iterations = k small job waves, and
  * at real scale each round's output would be checkpointed exactly as
  * [[Dedup]]'s CC rounds are. Out-degrees attach to edges once before the
  * loop. The fixed-iteration forms materialize their result
  * (`localCheckpoint`) and release the loop's cache leaves before
  * returning — callers get a self-contained frame, not a plan holding
  * persisted storage (the `Bpe.train` rule); [[pageRankConverged]] adds a
  * join-free convergence probe (the CC-loop pattern) so the iteration
  * count is measured, not guessed.
  */
object Graph {

  /** 3 iterations by default — a CAP for quick authority ranking where the
    * caller pins the round count (and the generated oracle unrolls to the
    * same constant); use [[pageRankConverged]] when the iteration count
    * should be measured against a delta bar instead of guessed.
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale > 0 && dampNum > 0 && dampDen > dampNum)
    // nodes and degree-attached edges are referenced EVERY iteration: they
    // must be cache leaves or each round re-plans (and AQE re-materializes)
    // the full upstream edge-construction tree — the q120 rule; measured
    // 110 AQE jobs → ~30 for q131's 3 rounds over the overlap graph
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().persist()
    val nFrame = nodes.agg(count(lit(1)).as("__n"))
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val edgesD = e.join(deg, "__src").persist()
    var r: DataFrame = nodes.crossJoin(broadcast(nFrame))
      .select(col("node"), expr(s"$scale div __n").as("__r"))
    val teleNum = scale * (dampDen - dampNum)
    (1 to iterations).foreach { _ =>
      val contribs = edgesD
        .join(r, edgesD("__src") === r("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr(s"(__r * $dampNum) div ($dampDen * __deg)")).as("__in"))
      r = nodes.crossJoin(broadcast(nFrame))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr(s"$teleNum div ($dampDen * __n)") +
            coalesce(col("__in"), lit(0L))).as("__r"))
    }
    // materialize (ONE action evaluates all rounds, reusing the leaves),
    // then release the leaves: the caller gets a self-contained frame
    val out = r.select(col("node"), col("__r").as("rank_fp")).localCheckpoint()
    nodes.unpersist()
    edgesD.unpersist()
    out
  }

  /** Converged-run outcome: the final ranks, the number of iteration
    * rounds actually executed, whether the delta bar was met within the
    * cap, and the last measured max per-node delta (micro-units).
    */
  final case class PageRankRun(
      ranks: DataFrame, rounds: Int, converged: Boolean, maxDelta: Long)

  /** CONVERGENCE-PROBED PageRank: iterate until the max per-node rank
    * delta is ≤ `eps` micro-units (or `maxIterations` caps the loop) and
    * report the round count — the measured alternative to guessing an
    * iteration constant, for graphs deep enough that 3 rounds silently
    * under-converge. The probe is JOIN-FREE (the CC-loop rule): each
    * round's frame carries (new rank, previous rank) side by side, so the
    * delta is one `max(abs(new − prev))` aggregate over the frame the
    * round materialized anyway — no extra join, one extra tiny action per
    * round. Per-round `localCheckpoint` keeps lineage flat (the
    * [[Dedup]] CC shape); node count and teleport are driver-side Longs
    * (one count() up front — the loop is action-per-round regardless).
    * Same exact integer arithmetic as [[pageRankFixedPoint]]: running
    * with `eps = 0` and a cap of k reproduces the k-iteration ranks
    * bit-for-bit (or stops earlier only at an EXACT fixed point).
    */
  def pageRankConverged(
      edges: DataFrame, srcCol: String, dstCol: String,
      eps: Long, maxIterations: Int = 50, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): PageRankRun = {
    require(maxIterations >= 1 && eps >= 0 && scale > 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val edgesD = e.join(deg, "__src").persist()
    val telePerNode = (scale * (dampDen - dampNum)) / (dampDen * n)
    var mat = nodes.select(col("node"), lit(scale / n).as("__r")).localCheckpoint()
    var r = mat
    var rounds = 0
    var delta = Long.MaxValue
    while (rounds < maxIterations && delta > eps) {
      val contribs = edgesD
        .join(r, edgesD("__src") === r("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr(s"(__r * $dampNum) div ($dampDen * __deg)")).as("__in"))
      val next = r.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(telePerNode) + coalesce(col("__in"), lit(0L))).as("__rn"),
          col("__r").as("__rp"))
        .localCheckpoint()
      delta = next.agg(max(abs(col("__rn") - col("__rp")))).head().getLong(0)
      mat.unpersist()
      mat = next
      r = next.select(col("node"), col("__rn").as("__r"))
      rounds += 1
    }
    nodes.unpersist()
    edgesD.unpersist()
    PageRankRun(
      r.select(col("node"), col("__r").as("rank_fp")),
      rounds, delta <= eps, delta)
  }

  /** Pure-Scala replay of [[pageRankConverged]] on a DRIVER-SIDE edge
    * list — same integer arithmetic, same stopping rule. This is the
    * oracle GENERATOR'S helper (the q27 generated-SQL rule): a gate on a
    * planted graph asks the replay for the converged round count at
    * object-init time and unrolls the SQL twin to exactly that many
    * iteration CTEs, so operator and oracle cannot drift. Driver-side
    * only — never call it with more than a fixture's worth of edges.
    */
  def pageRankConvergedReference(
      edges: Seq[(String, String)], eps: Long, maxIterations: Int = 50,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): (Map[String, Long], Int) = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    require(n > 0, "empty graph")
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val telePerNode = (scale * (dampDen - dampNum)) / (dampDen * n)
    var r = nodes.map(_ -> scale / n).toMap
    var rounds = 0
    var delta = Long.MaxValue
    while (rounds < maxIterations && delta > eps) {
      val in = edges
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _) => (r(s) * dampNum) / (dampDen * deg(s)) }.sum
        }
      val next = nodes.map(v => v -> (telePerNode + in.getOrElse(v, 0L))).toMap
      delta = nodes.map(v => math.abs(next(v) - r(v))).max
      r = next
      rounds += 1
    }
    (r, rounds)
  }

  /** WEIGHTED fixed-point PageRank — [[pageRankFixedPoint]] with each
    * edge carrying `weightCol` (e.g. the overlap mass between two
    * sources: a 3000-shingle link should not count like a 30-shingle
    * one). A source's damped rank is split across its out-edges
    * proportionally to weight, quantized to PER-MILLE of the source's
    * out-weight: `wn = (w·1000) div W(u)`, contribution =
    * `((r·dampNum) div dampDen · wn) div 1000`. The two-step quantization
    * is what keeps every product inside exact 64-bit range for ANY weight
    * magnitude (the naive `r·dampNum·w` overflows once w exceeds ~10⁷ —
    * shared-shingle masses at corpus scale do); the cost is ≤ 1‰ of a
    * node's damped mass lost to flooring per round (the dangling-mass
    * simplification's spirit), irrelevant to ranking and exactly
    * reproduced by the generated oracle. Same per-round join shape and
    * cache-leaf rule as the unweighted form.
    *
    * Weight contract, stated: edges with NULL, zero, or negative weight
    * carry no mass and are DROPPED from the contribution graph before
    * the out-weight sum (so `__wn` can never go NULL and silently zero a
    * node's out-contribution — ADVICE r8); their endpoints remain graph
    * NODES (teleport-ranked, the dangling rule). The generated twin
    * ([[pageRankWeightedSql]]) applies the identical `w > 0` filter.
    */
  def pageRankWeightedFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale > 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().persist()
    val nFrame = nodes.agg(count(lit(1)).as("__n"))
    val ePos = e.filter(col("__w") > 0)
    val wSum = ePos.groupBy(col("__src")).agg(sum(col("__w")).as("__wsum"))
    val edgesW = ePos.join(wSum, "__src")
      .withColumn("__wn", expr("(__w * 1000) div __wsum")).persist()
    var r: DataFrame = nodes.crossJoin(broadcast(nFrame))
      .select(col("node"), expr(s"$scale div __n").as("__r"))
    val teleNum = scale * (dampDen - dampNum)
    (1 to iterations).foreach { _ =>
      val contribs = edgesW
        .join(r, edgesW("__src") === r("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr(s"((__r * $dampNum) div $dampDen * __wn) div 1000")).as("__in"))
      r = nodes.crossJoin(broadcast(nFrame))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr(s"$teleNum div ($dampDen * __n)") +
            coalesce(col("__in"), lit(0L))).as("__r"))
    }
    val out = r.select(col("node"), col("__r").as("rank_fp")).localCheckpoint()
    nodes.unpersist()
    edgesW.unpersist()
    out
  }

  /** [[pageRankConverged]] for WEIGHTED edges — the converged complement
    * of [[pageRankWeightedFixedPoint]], completing the fixed/converged ×
    * unweighted/weighted family. Same per-mille weight quantization and
    * exact 64-bit arithmetic as the fixed form (`eps = 0` + cap k
    * reproduces its k-iteration ranks bit-for-bit, GraphSpec pins it);
    * same join-free delta probe and per-round `localCheckpoint` as the
    * unweighted converged form; same weight contract (w ≤ 0 edges carry
    * no mass, endpoints stay teleport-ranked nodes).
    */
  def pageRankWeightedConverged(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      eps: Long, maxIterations: Int = 50, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): PageRankRun = {
    require(maxIterations >= 1 && eps >= 0 && scale > 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val ePos = e.filter(col("__w") > 0)
    val wSum = ePos.groupBy(col("__src")).agg(sum(col("__w")).as("__wsum"))
    val edgesW = ePos.join(wSum, "__src")
      .withColumn("__wn", expr("(__w * 1000) div __wsum")).persist()
    val telePerNode = (scale * (dampDen - dampNum)) / (dampDen * n)
    var mat = nodes.select(col("node"), lit(scale / n).as("__r")).localCheckpoint()
    var r = mat
    var rounds = 0
    var delta = Long.MaxValue
    while (rounds < maxIterations && delta > eps) {
      val contribs = edgesW
        .join(r, edgesW("__src") === r("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr(s"((__r * $dampNum) div $dampDen * __wn) div 1000")).as("__in"))
      val next = r.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(telePerNode) + coalesce(col("__in"), lit(0L))).as("__rn"),
          col("__r").as("__rp"))
        .localCheckpoint()
      delta = next.agg(max(abs(col("__rn") - col("__rp")))).head().getLong(0)
      mat.unpersist()
      mat = next
      r = next.select(col("node"), col("__rn").as("__r"))
      rounds += 1
    }
    nodes.unpersist()
    edgesW.unpersist()
    PageRankRun(
      r.select(col("node"), col("__r").as("rank_fp")),
      rounds, delta <= eps, delta)
  }

  /** Pure-Scala replay of [[pageRankWeightedConverged]] on a DRIVER-SIDE
    * weighted edge list — the oracle generator's helper (the
    * [[pageRankConvergedReference]] rule: a gate measures the converged
    * round count at object init and unrolls the SQL twin to exactly that
    * many iteration CTEs). Driver-side only; fixture-sized inputs.
    */
  def pageRankWeightedConvergedReference(
      edges: Seq[(String, String, Long)], eps: Long, maxIterations: Int = 50,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): (Map[String, Long], Int) = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    require(n > 0, "empty graph")
    val pos = edges.filter(_._3 > 0)
    val wSum = pos.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val wn = pos.map { case (s, d, w) => (s, d, (w * 1000L) / wSum(s)) }
    val telePerNode = (scale * (dampDen - dampNum)) / (dampDen * n)
    var r = nodes.map(_ -> scale / n).toMap
    var rounds = 0
    var delta = Long.MaxValue
    while (rounds < maxIterations && delta > eps) {
      val in = wn
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _, w) => ((r(s) * dampNum) / dampDen * w) / 1000L }.sum
        }
      val next = nodes.map(v => v -> (telePerNode + in.getOrElse(v, 0L))).toMap
      delta = nodes.map(v => math.abs(next(v) - r(v))).max
      r = next
      rounds += 1
    }
    (r, rounds)
  }

  /** Generated DuckDB twin of [[pageRankWeightedFixedPoint]] (the q27
    * generated-SQL rule). Expects `$edgesCte(src, dst, w)`; emits CTEs
    * and the final `SELECT node, rank_fp` ordered by node. Nodes come
    * from ALL edges; mass only from `w > 0` edges — the operator's
    * stated weight contract. `extraSelect` is appended verbatim to the
    * final projection (e.g. a literal `n_rounds` for the convergence
    * gate).
    */
  def pageRankWeightedSql(
      edgesCte: String, iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L, extraSelect: String = ""): String = {
    val teleNum = scale * (dampDen - dampNum)
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
          SELECT v.node,
            ($teleNum // ($dampDen * (SELECT n FROM nn))) + coalesce(s.inflow, 0) AS r
          FROM nodes v LEFT JOIN (
            SELECT e.dst AS node,
              CAST(sum((($prev.r * $dampNum) // $dampDen * e.wn) // 1000) AS BIGINT)
                AS inflow
            FROM ew e
            JOIN $prev ON $prev.node = e.src
            GROUP BY e.dst) s USING (node))"""
    }.mkString(",\n        ")
    s"""nodes AS (
          SELECT DISTINCT src AS node FROM $edgesCte
          UNION SELECT DISTINCT dst FROM $edgesCte),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        ws AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM $edgesCte
               WHERE w > 0 GROUP BY src),
        ew AS (
          SELECT e.src, e.dst, (CAST(e.w AS BIGINT) * 1000) // ws.wsum AS wn
          FROM $edgesCte e JOIN ws USING (src) WHERE e.w > 0),
        r0 AS (
          SELECT node, ($scale // (SELECT n FROM nn)) AS r FROM nodes),
        $iters
        SELECT node, CAST(r AS BIGINT) AS rank_fp$extraSelect FROM r$iterations ORDER BY node"""
  }

  /** Generated DuckDB twin of [[pageRankFixedPoint]] — the iteration CTEs
    * are unrolled from the SAME constants and the same integral-division
    * expressions (the q27 generated-SQL rule: oracle and operator cannot
    * drift). Expects a CTE `$edgesCte(src, dst)` in scope; emits CTEs and
    * a final `SELECT node, rank_fp` ordered by node. `extraSelect` is
    * appended verbatim to the final projection (e.g. a literal
    * `n_rounds` column for the convergence gate).
    */
  def pageRankSql(
      edgesCte: String, iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L, extraSelect: String = ""): String = {
    val teleNum = scale * (dampDen - dampNum)
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
          SELECT v.node,
            ($teleNum // ($dampDen * (SELECT n FROM nn))) + coalesce(s.inflow, 0) AS r
          FROM nodes v LEFT JOIN (
            SELECT e.dst AS node,
              CAST(sum(($prev.r * $dampNum) // ($dampDen * d.deg)) AS BIGINT) AS inflow
            FROM $edgesCte e
            JOIN $prev ON $prev.node = e.src
            JOIN dg d ON d.src = e.src
            GROUP BY e.dst) s USING (node))"""
    }.mkString(",\n        ")
    s"""nodes AS (
          SELECT DISTINCT src AS node FROM $edgesCte
          UNION SELECT DISTINCT dst FROM $edgesCte),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM $edgesCte GROUP BY src),
        r0 AS (
          SELECT node, ($scale // (SELECT n FROM nn)) AS r FROM nodes),
        $iters
        SELECT node, CAST(r AS BIGINT) AS rank_fp$extraSelect FROM r$iterations ORDER BY node"""
  }

  // ------------------------------------------------- label propagation

  /** A converged (or capped) label-propagation run: the final labels, the
    * rounds executed, whether a fixed point was reached, and the last
    * round's changed-node count.
    */
  final case class LabelPropRun(
      labels: DataFrame, rounds: Int, converged: Boolean, nChanged: Long)

  /** DETERMINISTIC synchronous label propagation (Raghavan et al. 2007) —
    * community detection over the same provenance graphs PageRank ranks:
    * every node starts labeled as itself; each round, every node
    * simultaneously adopts the label held by the PLURALITY of its
    * neighbors. Ties break (1) toward the node's CURRENT label if it is
    * among the tied candidates — the standard stabilization, without
    * which the globally-smallest label floods across community bridges
    * on every tie (measured on the q168 fixture: one bridge edge merged
    * both cliques under bare min-tie-break) — then (2) by the smallest
    * label. The loop stops at a fixed point (no node changed) or at
    * `maxIterations`.
    *
    * Classic async LPA is run-order-dependent — useless under a
    * cross-engine hash gate. This synchronous form is a pure function of
    * the edge list (the fixed-point-PageRank determinism rule applied to
    * labels), at the cost of possible 2-cycles on bipartite structures —
    * which the cap absorbs and the `converged` flag reports honestly
    * (GraphSpec pins an oscillator).
    *
    * Scale shape per round: one edges⋈labels equi-join on the neighbor
    * end + one map-combinable (node, label) count + one per-node top-1 —
    * a `WindowGroupLimit`-eligible rank, the q05 shape, never a global
    * sort. The symmetrized edge list is the loop-invariant cache leaf;
    * per-round `localCheckpoint` keeps lineage flat and the convergence
    * probe is join-free (prev label carried beside the new one).
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20): LabelPropRun = {
    require(maxIterations >= 1)
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .filter(col("__a") =!= col("__b"))
    val sym = e0.union(e0.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct().persist()
    var ck = sym.select(col("__a").as("node")).distinct()
      .select(col("node"), col("node").as("__lab")).localCheckpoint()
    var mat = ck
    var rounds = 0
    var changed = Long.MaxValue
    while (rounds < maxIterations && changed > 0) {
      val nbrLabs = sym
        .join(mat.select(col("node").as("__b"), col("__lab")), "__b")
        .select(col("__a").as("node"), col("__lab"))
      val cnt = nbrLabs.groupBy(col("node"), col("__lab"))
        .agg(count(lit(1)).as("__c"))
        .join(mat.select(col("node"), col("__lab").as("__cur")), "node")
      val w = Window.partitionBy(col("node"))
        .orderBy(col("__c").desc, (col("__lab") === col("__cur")).desc, col("__lab"))
      val next = cnt.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("__lab").as("__new"), col("__cur").as("__prev"))
        .localCheckpoint()
      changed = next.filter(col("__new") =!= col("__prev")).count()
      ck.unpersist()
      ck = next
      mat = next.select(col("node"), col("__new").as("__lab"))
      rounds += 1
    }
    sym.unpersist()
    LabelPropRun(
      mat.select(col("node"), col("__lab").as("community")),
      rounds, changed == 0L, changed)
  }

  /** Pure-Scala replay of [[labelPropagation]] on a driver-side edge list
    * — same symmetrization, same plurality/min-tie-break update, same
    * stopping rule. The oracle generator's helper (the q136 rule): a gate
    * on a planted graph measures the converged round count here at object
    * init and unrolls [[labelPropagationSql]] to exactly that many CTEs.
    * Fixture-sized inputs only.
    */
  def labelPropagationReference(
      edges: Seq[(String, String)],
      maxIterations: Int = 20): (Map[String, String], Int, Boolean) = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab: Map[String, String] = nbrs.keys.map(k => k -> k).toMap
    var rounds = 0
    var changed = Int.MaxValue
    while (rounds < maxIterations && changed > 0) {
      val cur = lab
      val next = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(cur).map { case (l, vs) => l -> vs.size }
        // (count DESC, is-current DESC, label ASC) — keep-current-on-tie
        v -> counts.toSeq.minBy { case (l, c) => (-c, if (l == cur(v)) 0 else 1, l) }._1
      }
      changed = next.count { case (v, l) => lab(v) != l }
      lab = next
      rounds += 1
    }
    (lab, rounds, changed == 0)
  }

  /** TRIANGLE COUNT + local clustering coefficient per node — the
    * cohesion diagnostic beside [[labelPropagation]]'s communities: a
    * provenance cluster with high triangle density is a tight copy ring;
    * a hub with many neighbors but no triangles is an aggregator.
    *
    * Shape: the classic ORIENTED 3-way self-join — symmetrize, then keep
    * each edge once directed low→high node, so every triangle {a<b<c}
    * materializes exactly once as e(a,b)⋈e(b,c)⋈e(a,c) and no
    * permutation dedup is ever needed. Two equi-joins + two
    * map-combinable aggregates; the wedge join's fan-out is bounded by
    * out-degree under the orientation (≤ total degree), the standard
    * mitigation for hub nodes. Coefficient = 2·triangles /
    * (deg·(deg−1)), integer inputs, rounded at 4 — nodes of degree 1
    * have no possible wedge and report 0.
    */
  def triangleStats(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .filter(col("__a") =!= col("__b"))
    val sym = e0.union(e0.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct()
    val oriented = sym.filter(col("__a") < col("__b")).persist()
    val deg = sym.groupBy(col("__a").as("node")).agg(count(lit(1)).as("degree"))
    // wedges a<b<c closed by the (a,c) edge
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.__b") === col("e2.__a"))
      .join(oriented.as("e3"),
        col("e1.__a") === col("e3.__a") && col("e2.__b") === col("e3.__b"))
      .select(col("e1.__a").as("ta"), col("e1.__b").as("tb"), col("e2.__b").as("tc"))
    // each triangle credits all three corners
    val perNode = tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - 1)), 4))
          .otherwise(lit(0.0)))
      .localCheckpoint()
    oriented.unpersist()
    out
  }

  /** SQL twin of [[triangleStats]] — same orientation, same joins, same
    * coefficient arithmetic. Expects `$edgesCte(src, dst)`.
    */
  def triangleStatsSql(edgesCte: String, extraSelect: String = ""): String =
    s"""sedges AS (
          SELECT src AS a, dst AS b FROM $edgesCte WHERE src <> dst
          UNION
          SELECT dst AS a, src AS b FROM $edgesCte WHERE src <> dst),
        oriented AS (SELECT a, b FROM sedges WHERE a < b),
        deg AS (SELECT a AS node, count(*) AS degree FROM sedges GROUP BY a),
        tri AS (
          SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
          FROM oriented e1
          JOIN oriented e2 ON e1.b = e2.a
          JOIN oriented e3 ON e1.a = e3.a AND e2.b = e3.b),
        corners AS (
          SELECT ta AS node FROM tri
          UNION ALL SELECT tb FROM tri
          UNION ALL SELECT tc FROM tri),
        pern AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node)
        SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
          CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
          CASE WHEN d.degree >= 2
            THEN round(CAST(2 * coalesce(p.triangles, 0) AS DOUBLE)
              / (d.degree * (d.degree - 1)), 4)
            ELSE CAST(0 AS DOUBLE) END AS clustering_coeff$extraSelect
        FROM deg d LEFT JOIN pern p USING (node) ORDER BY node"""

  /** A k-core run: the surviving subgraph's nodes with their final
    * degrees, the peel rounds executed, and whether the peel reached a
    * fixed point within the cap.
    */
  final case class KCoreRun(
      nodes: DataFrame, rounds: Int, converged: Boolean, lastRemoved: Long)

  /** K-CORE: the maximal subgraph where every node keeps degree ≥ k —
    * the robustness cut beside [[triangleStats]]' cohesion: a source
    * surviving the 3-core is held by at least three mutually-supported
    * partners; a pendant chain peels away no matter how long. Iterative
    * BATCH PEEL (Matula/Beck's algorithm, synchronized): each round drops
    * EVERY node under degree k simultaneously, so the result and the
    * round count are a pure function of the edge list (the sequential
    * min-degree order is not) and the SQL twin unrolls to the measured
    * round count (the q136/q168 gate rule).
    *
    * Scale shape per round: one degree aggregate (map-combinable) + two
    * semi-joins restricting the edge list — the CC-round shape, flat
    * lineage via per-round localCheckpoint; the loop ends when a round
    * removes nothing. Rounds are bounded by the peel depth (≤ longest
    * chain), not the node count.
    */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIterations: Int = 50): KCoreRun = {
    require(k >= 1 && maxIterations >= 1)
    val sym = symmetrized(edges, srcCol, dstCol)
    val (cur, rounds, converged, removed) = peelAt(sym, k, maxIterations)
    if (cur ne sym) sym.unpersist()
    val nodes = cur.groupBy(col("__a").as("node")).agg(count(lit(1)).as("degree"))
    KCoreRun(nodes, rounds, converged, removed)
  }

  /** One full peel at threshold `k` over a symmetrized edge list: drop
    * every node under degree k simultaneously, repeat until stable (or
    * the cap). Returns (surviving edges, rounds, converged, lastRemoved)
    * — shared by [[kCore]] and [[coreness]]'s phases. Does NOT unpersist
    * its input; callers own their frames.
    */
  private def peelAt(
      sym: DataFrame, k: Int, maxIterations: Int): (DataFrame, Int, Boolean, Long) = {
    var cur = sym
    var rounds = 0
    var removed = Long.MaxValue
    // node count of `cur`, carried across rounds (r19 opt, guide §1.2):
    // round N's `next` IS round N+1's `cur`, so re-counting it was a
    // second distinct+count action per round — the carried value computes
    // the identical `removed` sequence with ONE count job per round (plus
    // one for the first round's baseline).
    var curNodes = -1L
    while (rounds < maxIterations && removed > 0L) {
      val keep = cur.groupBy(col("__a").as("node")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("node"))
      val next = cur
        .join(keep.select(col("node").as("__a")), "__a")
        .join(keep.select(col("node").as("__b")), "__b")
        .select(col("__a"), col("__b"))
        .localCheckpoint()
      // survivors-per-side counts: a removed node takes its edges with it
      if (curNodes < 0L) curNodes = cur.select(col("__a")).distinct().count()
      val nextNodes = next.select(col("__a")).distinct().count()
      removed = curNodes - nextNodes
      curNodes = nextNodes
      if (cur ne sym) cur.unpersist()
      cur = next
      rounds += 1
    }
    (cur, rounds, removed == 0L, removed)
  }

  private def symmetrized(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .filter(col("__a") =!= col("__b"))
    e0.union(e0.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct().localCheckpoint()
  }

  /** CORENESS — the full k-core decomposition: per node, the LARGEST k
    * whose k-core still contains it (a K4 corner → 3, a triangle member
    * → 2, a pendant → 1). Phases nest monotonically: the (k+1)-core is a
    * subgraph of the k-core, so phase k+1 peels the PREVIOUS phase's
    * survivors, never the whole graph — total work is Σ shrinking phase
    * sizes, and the driver loop runs degeneracy+1 phases (single digits
    * on real provenance graphs), each phase the same deterministic batch
    * peel as [[kCore]]. Nodes dropped during phase k carry coreness k−1.
    */
  def coreness(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 50): DataFrame = {
    val sym = symmetrized(edges, srcCol, dstCol)
    var cur = sym
    var k = 1
    var out: Option[DataFrame] = None
    val phaseLeaves = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!cur.isEmpty && k <= maxIterations) {
      val (next, _, phaseConverged, _) = peelAt(cur, k, maxIterations)
      // an uncapped peel is the correctness precondition: a phase stopped
      // mid-peel would hand its un-peeled remainder to phase k+1, which
      // would then OVER-state those nodes' coreness with no error signal
      require(phaseConverged,
        s"coreness phase k=$k hit the $maxIterations-round cap before its " +
          "fixed point — raise maxIterations (long chains peel 2 nodes/round)")
      // materialize before cur is unpersisted below — the anti-join reads
      // the frame the phase is about to release
      val dropped = cur.select(col("__a").as("node")).distinct()
        .join(next.select(col("__a").as("node")).distinct(), Seq("node"), "left_anti")
        .withColumn("coreness", lit(k - 1))
        .localCheckpoint()
      phaseLeaves += dropped
      out = Some(out.fold(dropped)(_.unionByName(dropped)))
      if (cur ne sym) cur.unpersist()
      cur = next
      k += 1
    }
    // the phase loop above exits either because the graph peeled empty
    // (done) or because k outran maxIterations with SURVIVORS — the
    // latter would silently omit those nodes from the decomposition (no
    // coreness row at all), so fail as loudly as the in-phase cap does
    // (ADVICE r13: truncation must not masquerade as completion)
    require(cur.isEmpty,
      s"coreness stopped at k=$maxIterations (maxIterations) with nodes still " +
        s"in the $maxIterations-core — the graph's degeneracy exceeds the cap; " +
        "raise maxIterations to cover it")
    // ONE materialization of the union, then release every phase leaf —
    // the caller gets a self-contained frame (the pageRank rule)
    val res = out
      .getOrElse(sym.select(col("__a").as("node"), lit(0).as("coreness")).filter(lit(false)))
      .localCheckpoint()
    phaseLeaves.foreach(_.unpersist())
    if (cur ne sym) cur.unpersist()
    sym.unpersist()
    res
  }

  /** Pure-Scala replay of [[kCore]] (fixture-sized) — the measured-round
    * oracle helper, q136 rule.
    */
  def kCoreReference(
      edges: Seq[(String, String)], k: Int,
      maxIterations: Int = 50): (Map[String, Int], Int, Boolean) = {
    var sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    var rounds = 0
    var removed = Int.MaxValue
    while (rounds < maxIterations && removed > 0) {
      val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = sym.filter(e => keep(e._1) && keep(e._2))
      removed = sym.map(_._1).distinct.size - next.map(_._1).distinct.size
      sym = next
      rounds += 1
    }
    (sym.groupBy(_._1).map { case (v, es) => v -> es.size }, rounds, removed == 0)
  }

  /** SQL twin of [[kCore]], unrolled to a FIXED round count — same
    * simultaneous peel, same degree rule. Expects `$edgesCte(src, dst)`.
    */
  def kCoreSql(edgesCte: String, k: Int, iterations: Int,
      extraSelect: String = ""): String = {
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""n$i AS (
          SELECT a AS node FROM $prev GROUP BY a HAVING count(*) >= $k),
        e$i AS (
          SELECT e.a, e.b FROM $prev e
          JOIN n$i x ON x.node = e.a
          JOIN n$i y ON y.node = e.b)"""
    }.mkString(",\n        ")
    s"""e0 AS (
          SELECT src AS a, dst AS b FROM $edgesCte WHERE src <> dst
          UNION
          SELECT dst AS a, src AS b FROM $edgesCte WHERE src <> dst),
        $iters
        SELECT a AS node, count(*) AS degree$extraSelect
        FROM e$iterations GROUP BY a ORDER BY node"""
  }

  /** SQL twin of [[labelPropagation]], unrolled to a FIXED round count —
    * same symmetrize-dedupe, same (count DESC, keep-current DESC, label
    * ASC) top-1 per node.
    * Expects a CTE `$edgesCte(src, dst)`; emits CTEs and a final
    * `SELECT node, community` ordered by node; `extraSelect` appends
    * verbatim (the measured `n_rounds` literal).
    */
  def labelPropagationSql(
      edgesCte: String, iterations: Int, extraSelect: String = ""): String = {
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (
          SELECT e.a AS node, l.lab AS lab, count(*) AS c
          FROM sedges e JOIN $prev l ON e.b = l.node
          GROUP BY e.a, l.lab),
        l$i AS (
          SELECT node, lab FROM (
            SELECT c.node, c.lab,
              row_number() OVER (PARTITION BY c.node
                ORDER BY c.c DESC, (c.lab = p.lab) DESC, c.lab) AS rn
            FROM c$i c JOIN $prev p ON p.node = c.node) t WHERE rn = 1)"""
    }.mkString(",\n        ")
    s"""sedges AS (
          SELECT src AS a, dst AS b FROM $edgesCte WHERE src <> dst
          UNION
          SELECT dst AS a, src AS b FROM $edgesCte WHERE src <> dst),
        l0 AS (SELECT DISTINCT a AS node, a AS lab FROM sedges),
        $iters
        SELECT node, lab AS community$extraSelect FROM l$iterations ORDER BY node"""
  }
}
