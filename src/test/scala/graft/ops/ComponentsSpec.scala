package graft.ops

import graft.SparkSpec
import graft.sources.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The lazy two-table union-find ([[Components]]): resolved labels equal
  * the from-scratch [[Dedup.keepers]] clustering for any batch split,
  * the forward table stays one-hop (targets are never keys), replays are
  * no-ops, and the fold flattens without changing the resolved view.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTables(): (String, String) = {
    n += 1
    (s"cmp_lab_$n", s"cmp_fwd_$n")
  }

  private def resolved(lab: String, fwd: String): Map[Long, Long] =
    Components.resolvedLabels(spark, lab, fwd, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def applySplit(
      lab: String, fwd: String,
      batches: Seq[(Seq[Long], Seq[(Long, Long)])]): Unit =
    batches.foreach { case (ids, pairs) =>
      Components.applyBatch(spark, lab, fwd,
        ids.toDF("doc_id"), "doc_id", pairs.toDF("id_a", "id_b"))
    }

  test("resolved labels equal from-scratch keepers on a random graph, any split") {
    val rnd = new scala.util.Random(7)
    val ids = (1L to 60L)
    val pairs = Seq.fill(45)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L))
      .filter(p => p._1 != p._2)
    val docs = ids.map(i => (i, s"d$i")).toDF("doc_id", "text")
    val expect = Dedup.keepers(docs, "doc_id", pairs.toDF("id_a", "id_b"))
      .select(col("doc_id"), col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (nBatches <- Seq(1, 4)) {
      val (lab, fwd) = freshTables()
      // hash-split ids into batches; each pair rides the LATER endpoint's
      // batch (the incremental family's arrival rule)
      val batchOf = ids.map(i => i -> (i % nBatches).toInt).toMap
      val split = (0 until nBatches).map { bi =>
        val bids = ids.filter(batchOf(_) == bi)
        val bpairs = pairs.filter(p => math.max(batchOf(p._1), batchOf(p._2)) == bi)
        (bids, bpairs)
      }
      applySplit(lab, fwd, split)
      assert(resolved(lab, fwd) === expect, s"diverged at $nBatches batches")
    }
  }

  test("driver union-find and distributed CC fallback produce identical tables") {
    // same random graph, same split, one run per merge engine: the
    // default path takes the in-process union-find (graph << cap), the
    // cap=0 run forces Dedup.connectedComponents — r15's hybrid must be
    // indistinguishable down to the STORED tables, not just the resolved
    // view (forward keys/targets are part of the one-hop contract)
    val rnd = new scala.util.Random(13)
    val ids = (1L to 80L)
    val pairs = Seq.fill(60)((rnd.nextInt(80) + 1L, rnd.nextInt(80) + 1L))
      .filter(p => p._1 != p._2)
    val batchOf = ids.map(i => i -> (i % 3).toInt).toMap
    val split = (0 until 3).map { bi =>
      (ids.filter(batchOf(_) == bi),
        pairs.filter(p => math.max(batchOf(p._1), batchOf(p._2)) == bi))
    }
    def run(cap: Int): (Map[Long, Long], Map[Long, Long], Map[Long, Long]) = {
      val (lab, fwd) = freshTables()
      split.foreach { case (bids, bpairs) =>
        Components.applyBatch(spark, lab, fwd,
          bids.toDF("doc_id"), "doc_id", bpairs.toDF("id_a", "id_b"),
          maxLocalRootEdges = cap)
      }
      val f = Store.read(spark, fwd)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val l = Store.read(spark, lab)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (resolved(lab, fwd), l, f)
    }
    // three engines (r17): the whole-trigger driver fast path (default
    // cap — ids and pairs both under it), the distributed body with the
    // in-process union-find merge (cap 10: ~27 ids/batch bail the fast
    // path, root graphs still fit localMerges), and the fully
    // distributed Dedup.connectedComponents fixpoint (cap 0)
    val (resLocal, labLocal, fwdLocal) = run(Components.MaxLocalRootEdges)
    val (resMid, labMid, fwdMid) = run(10)
    val (resDist, labDist, fwdDist) = run(0)
    assert(resLocal === resDist, "resolved views diverged between merge engines")
    assert(labLocal === labDist, "stored label rows diverged between merge engines")
    assert(fwdLocal === fwdDist, "forward tables diverged between merge engines")
    assert(resMid === resDist, "resolved views diverged on the mid-cap engine")
    assert(labMid === labDist, "stored label rows diverged on the mid-cap engine")
    assert(fwdMid === fwdDist, "forward tables diverged on the mid-cap engine")
  }

  test("forward table is one-hop: targets are never keys, labels point through one hop") {
    val (lab, fwd) = freshTables()
    // chain of merges across batches: {30,31} then {20,21}∪30s then
    // {10,11}∪20s then new min 5 joins everything
    applySplit(lab, fwd, Seq(
      (Seq(30L, 31L), Seq((30L, 31L))),
      (Seq(20L, 21L), Seq((20L, 21L), (21L, 30L))),
      (Seq(10L, 11L), Seq((10L, 11L), (11L, 20L))),
      (Seq(5L), Seq((5L, 30L)))))
    val f = Store.read(spark, fwd)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.values.toSet.intersect(f.keySet).isEmpty,
      s"forward chains present: $f")
    assert(f.values.forall(_ == 5L), s"targets not fully resolved: $f")
    assert(resolved(lab, fwd).values.toSet === Set(5L))
  }

  test("a new doc with a smaller id becomes the root; the old root forwards to it") {
    val (lab, fwd) = freshTables()
    applySplit(lab, fwd, Seq(
      (Seq(10L, 11L), Seq((10L, 11L))),
      (Seq(5L), Seq((5L, 11L)))))
    assert(resolved(lab, fwd) === Map(10L -> 5L, 11L -> 5L, 5L -> 5L))
    val f = Store.read(spark, fwd)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10 was the superseded root; 11's batch-local entry rode along and
    // was retargeted with it (dead but harmless — no label points to 11)
    assert(f === Map(10L -> 5L, 11L -> 5L))
  }

  test("replaying a batch moves nothing: tables version-stable, resolved unchanged") {
    val (lab, fwd) = freshTables()
    val b1 = (Seq(1L, 2L, 3L), Seq((1L, 2L)))
    val b2 = (Seq(4L), Seq((3L, 4L), (2L, 3L)))
    applySplit(lab, fwd, Seq(b1, b2))
    val before = resolved(lab, fwd)
    val labVer = Store.versions(spark, lab).last
    val fwdVer = Store.versions(spark, fwd).last
    applySplit(lab, fwd, Seq(b2)) // at-least-once redelivery
    assert(resolved(lab, fwd) === before)
    assert(Store.versions(spark, lab).last === labVer,
      "replay wrote a label generation")
    assert(Store.versions(spark, fwd).last === fwdVer,
      "replay wrote a forward generation")
  }

  test("fold flattens forwards into labels, clears the table, and is idempotent") {
    val (lab, fwd) = freshTables()
    applySplit(lab, fwd, Seq(
      (Seq(10L, 11L), Seq((10L, 11L))),
      (Seq(20L, 21L), Seq((20L, 21L))),
      (Seq(5L), Seq((5L, 11L), (5L, 21L)))))
    val before = resolved(lab, fwd)
    assert(before.values.toSet === Set(5L))
    Components.fold(spark, lab, fwd, "doc_id")
    assert(resolved(lab, fwd) === before, "fold changed the resolved view")
    assert(Store.read(spark, fwd).isEmpty, "fold left forward entries")
    // stored labels now hold the current roots directly
    assert(Store.read(spark, lab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === before)
    Components.fold(spark, lab, fwd, "doc_id") // no-op re-run
    assert(resolved(lab, fwd) === before)
    // post-fold merges keep working: fresh forwards over folded labels
    applySplit(lab, fwd, Seq((Seq(3L), Seq((3L, 10L)))))
    assert(resolved(lab, fwd).values.toSet === Set(3L))
  }

  test("crash window between the fold's label flatten and the forward clear is invisible") {
    val (lab, fwd) = freshTables()
    applySplit(lab, fwd, Seq(
      (Seq(10L, 11L), Seq((10L, 11L))),
      (Seq(5L), Seq((5L, 11L)))))
    val before = resolved(lab, fwd)
    // simulate the crash: flatten labels by hand, leave the forward rows
    val fwdRows = Store.read(spark, fwd).localCheckpoint()
    val affected = Store.read(spark, lab)
      .join(broadcast(fwdRows.withColumnRenamed("old_root", "component")),
        Seq("component"))
      .select(col("doc_id"), col("root").as("component"))
      .localCheckpoint()
    Store.upsert(spark, lab, affected, "doc_id", 4)
    // folded labels hold current roots, which are never forward keys —
    // the leftover rows match nothing
    assert(resolved(lab, fwd) === before)
    Components.fold(spark, lab, fwd, "doc_id") // the retry converges
    assert(resolved(lab, fwd) === before)
    assert(Store.read(spark, fwd).isEmpty)
  }
}
