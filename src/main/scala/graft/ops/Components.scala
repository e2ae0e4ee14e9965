package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Store

/** LAZY incremental connected components over Store-backed state — the
  * per-trigger O(corpus) read that [[Dedup.incrementalComponents]]'s
  * eager relabel pays (its relabel join scans the full label table,
  * 16 bytes/doc, every call — fine per q193's documented shape, a real
  * per-trigger cost at 100 TB) replaced by a union-find split across two
  * tables (public algorithmic ground: disjoint-set forests with path
  * compression, folded periodically):
  *
  *  - `labelsTable` (keyed by the doc id): each doc's component AS OF
  *    ITS LAST WRITE — possibly stale after later merges, never wrong
  *    about membership;
  *  - `forwardTable` (keyed by the superseded root): `old_root → root`,
  *    kept FULLY RESOLVED (every target is a CURRENT root, so resolution
  *    is exactly ONE hop — no iterative chasing on the read path). It
  *    holds one row per root superseded since the last [[fold]]: merges
  *    are rare relative to docs, so the frame stays broadcast-small.
  *
  * The TRUE label of a doc is `coalesce(forward[label], label)`
  * ([[resolve]]). Per batch, [[applyBatch]] touches only:
  *  - the batch endpoints' label rows, read PARTITION-PRUNED
  *    ([[graft.sources.Store.readForKeys]] — min(|batch|, parts) dirs,
  *    not the table);
  *  - a connected-components pass over the batch's ROOT graph (nodes =
  *    the endpoints' current roots — batch-sized, never corpus-sized);
  *  - O(batch) label upserts for NEW docs and O(merges) forward upserts.
  * No stored doc's label row is rewritten at merge time — that is the
  * whole trick; the forward entry re-points everyone at once.
  *
  * [[fold]] flattens the forward table back into the big one on a
  * maintenance cadence (one O(table) read, O(affected) write — the
  * `Store.compact` amortization rule), then clears it. Crash between
  * the two halves is safe: folded labels hold current roots, which are
  * NEVER forward keys (a superseded root can never become a root again
  * — its component keeps a smaller member forever), so leftover forward
  * rows match nothing and a re-run converges.
  *
  * Replay (at-least-once delivery): a replayed batch's pairs re-map to
  * already-merged roots (self-edges, filtered), and its ids are already
  * labeled (anti-joined out) — both writes are empty, the tables do not
  * move. ComponentsSpec pins equality with the from-scratch
  * [[Dedup.keepers]] labeling over random graphs and splits, the
  * one-hop invariant, replay idempotence, and the fold.
  *
  * Same canonical labeling as the eager path: component = min member id
  * (merges pick the min root; a new doc with a smaller id than an old
  * root BECOMES the root and the old one forwards to it), so the
  * resolved view equals a from-scratch run for any batch split — two
  * routes, one truth (the q202 gate).
  */
object Components {

  /** Root-graph edge cap for the driver-side union-find in
    * [[applyBatch]]: a micro-batch's root graph collects (one bounded
    * job, `limit(cap+1)` so an over-cap graph never materializes
    * driver-side) and merges resolve in-process; a graph past the cap —
    * a giant batch or an adversarial all-dups burst — runs the
    * distributed [[Dedup.connectedComponents]] fixpoint instead.
    *
    * 200k, not the 2M of r15 (ADVICE r15): the cap bounds not just the
    * collect (specialized `(Long, Long)` tuples, ~32 B/edge with
    * headers) but the merge frame that comes back as a LocalRelation —
    * embedded in and BROADCAST by three downstream join plans, so the
    * driver pays the cap several times over. 200k edges keeps the worst
    * case a few tens of MB; larger graphs take the distributed fixpoint,
    * which they amortize anyway.
    */
  private[graft] val MaxLocalRootEdges = 200000

  /** Driver-side min-label union-find over the root graph: returns the
    * `old_root → root` merge frame as a LocalRelation (so downstream
    * broadcast joins plan without a shuffle), or None when the graph
    * exceeds [[MaxLocalRootEdges]] or its ids are not 64-bit integers
    * (the distributed path handles both).
    */
  private def localMerges(rootPairs: DataFrame, cap: Int): Option[DataFrame] = {
    val longIds = rootPairs.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (!longIds || cap <= 0) return None
    // typed collect: specialized (Long, Long) tuples, not GenericRow
    // boxes — the row path cost ~10× the 16 B/edge the cap budgets for
    // (ADVICE r15)
    import rootPairs.sparkSession.implicits._
    val edges = rootPairs.limit(cap + 1).as[(Long, Long)].collect()
    if (edges.length > cap) return None
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins — the canonical labeling
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val merged = parent.keys.toArray.map(k => (k, find(k))).filter(p => p._1 != p._2)
    Some(merged.toSeq.toDF("old_root", "root"))
  }

  /** Apply one hop of forwarding: the true labels under pending merges.
    * `forward` is broadcast — its size is the merge count since the last
    * fold, not the corpus.
    */
  def resolve(labels: DataFrame, forward: DataFrame, idCol: String): DataFrame =
    labels
      .join(broadcast(forward.withColumnRenamed("old_root", "component")),
        Seq("component"), "left")
      .select(col(idCol), coalesce(col("root"), col("component")).as("component"))

  /** The store-backed resolved view — what a from-scratch clustering of
    * everything applied so far would produce. Missing tables read empty.
    */
  def resolvedLabels(
      spark: SparkSession, labelsTable: String, forwardTable: String,
      idCol: String): DataFrame = {
    if (!spark.catalog.tableExists(labelsTable))
      return spark.range(0).select(col("id").as(idCol), col("id").as("component"))
    val labels = Store.read(spark, labelsTable)
    val forward =
      if (spark.catalog.tableExists(forwardTable)) Store.read(spark, forwardTable)
      else labels.select(col(idCol).as("old_root"), col(idCol).as("root")).filter(lit(false))
    resolve(labels, forward, idCol)
  }

  /** Driver-side whole-trigger fast path (r17 — the last open r15
    * verdict item, per-trigger fixed job overhead): the distributed
    * [[applyBatch]] body runs NINE separate Spark queries per
    * micro-batch (six `localCheckpoint` materializations, two upserts,
    * a collect), each paying analysis + AQE + tiny-shuffle scheduling
    * on frames that are MICRO-BATCH-sized by construction — ~3.9 s and
    * ~32 jobs per trigger measured at the q202 gate, none of it data.
    * When every input frame fits the [[MaxLocalRootEdges]] cap, the
    * whole root-resolution runs in-process instead: collect the batch
    * ids and pairs (bounded, no shuffle — `limit(cap+1)` so an
    * over-cap frame never materializes), read the endpoints' stored
    * labels through the same partition-pruned [[Store.probe]] the
    * distributed path uses (ONE bounded job), collect the
    * broadcast-small forward table, and compute epRoot / merges /
    * retarget / new labels with the [[localMerges]] union-find. Only
    * the two table writes stay distributed — they move the state. The
    * resulting TABLE STATES are row-identical to the distributed
    * path's for any input (ComponentsSpec pins equality across caps on
    * random graphs and splits); a frame past the cap, a non-64-bit id
    * column, or `cap <= 0` returns false and the distributed path runs
    * unchanged — the scale story is the same two-tier one the
    * union-find already had.
    */
  private def applyBatchLocal(
      spark: SparkSession, labelsTable: String, forwardTable: String,
      ids: DataFrame, idCol: String, newPairs: DataFrame,
      buckets: Int, parts: Int, cap: Int): Boolean = {
    import org.apache.spark.sql.types.LongType
    if (cap <= 0) return false
    if (ids.schema.fields.exists(_.dataType != LongType) ||
      newPairs.schema.fields.exists(_.dataType != LongType)) return false
    import spark.implicits._
    val idArr = ids.limit(cap + 1).as[Long].collect()
    if (idArr.length > cap) return false
    val pairArr = newPairs.select(col("id_a"), col("id_b"))
      .limit(cap + 1).as[(Long, Long)].collect()
    if (pairArr.length > cap) return false
    val fwdExists = spark.catalog.tableExists(forwardTable)
    val fwdArr: Array[(Long, Long)] =
      if (fwdExists) {
        val a = Store.read(spark, forwardTable)
          .select(col("old_root"), col("root"))
          .limit(cap + 1).as[(Long, Long)].collect()
        // broadcast-small by the fold-cadence contract, but a caller
        // that never folds could grow it past the driver budget — the
        // distributed path keeps working there
        if (a.length > cap) return false
        a
      } else Array.empty
    // endpoint key set: batch ids ∪ pair endpoints, deduped in-process
    // (the distributed path's `distinct()` shuffle, for free)
    val epSet = scala.collection.mutable.LongMap.empty[Unit]
    idArr.foreach(epSet.update(_, ()))
    pairArr.foreach { case (a, b) => epSet.update(a, ()); epSet.update(b, ()) }
    val labExists = spark.catalog.tableExists(labelsTable)
    val storedMap = scala.collection.mutable.LongMap.empty[Long]
    if (labExists && epSet.nonEmpty) {
      // same partition-pruned probe as the distributed path, with a
      // LOCAL key frame: the routing collect is a LocalTableScan and
      // the result is ≤ |endpoints| rows — cap-bounded by construction
      val keys = epSet.keys.toSeq.toDF(idCol)
      Store.probe(spark, labelsTable, keys, idCol)
        .select(col(idCol), col("component"))
        .as[(Long, Long)].collect()
        .foreach { case (i, c) => storedMap(i) = c }
    }
    val fwdMap = scala.collection.mutable.LongMap.empty[Long]
    fwdArr.foreach { case (o, r) => fwdMap(o) = r }
    // current root per endpoint: stored label → one forward hop; an
    // unlabeled (new) id is its own root — [[applyBatch]]'s epRoot
    def curRoot(x: Long): Long = storedMap.get(x) match {
      case Some(c) => fwdMap.getOrElse(c, c)
      case None => x
    }
    // min-label union-find over the root graph — [[localMerges]]'s
    // exact loop (same canonical labeling: min root wins)
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairArr.foreach { case (a, b) =>
      val (ra, rb) = (find(curRoot(a)), find(curRoot(b)))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val merges = parent.keys.toArray.map(k => (k, find(k))).filter(p => p._1 != p._2)
    val mergesMap = scala.collection.mutable.LongMap.empty[Long]
    merges.foreach { case (o, r) => mergesMap(o) = r }
    // forward stays fully resolved: entries whose TARGET merged
    // re-point in the same commit (one-hop invariant); merge keys are
    // roots superseded NOW, forward keys were superseded earlier — the
    // two key sets never collide
    val retarget = fwdArr.collect {
      case (o, r) if mergesMap.contains(r) => (o, mergesMap(r))
    }
    val fwdUp = merges ++ retarget
    if (fwdUp.nonEmpty) {
      val up = fwdUp.toSeq.toDF("old_root", "root")
      if (fwdExists) Store.upsert(spark, forwardTable, up, "old_root", buckets)
      else Store.bulkWrite(up, forwardTable, "old_root", buckets = buckets, parts = parts)
    }
    // label rows ONLY for this batch's genuinely-new docs (a replayed
    // batch's ids are already stored); a new id's root is itself, so
    // its final component is just its merge target (or itself)
    val newLabels = idArr.filterNot(storedMap.contains)
      .map(i => (i, mergesMap.getOrElse(i, i)))
    if (newLabels.nonEmpty) {
      val up = newLabels.toSeq.toDF(idCol, "component")
      if (labExists) Store.upsert(spark, labelsTable, up, idCol, buckets)
      else Store.bulkWrite(up, labelsTable, idCol, buckets = buckets, parts = parts)
    }
    true
  }

  /** Fold one batch of new docs + new pairs into the tables. `newIds`
    * carries the batch's doc ids (one column, named `idCol`); `newPairs`
    * carries `(id_a, id_b)` — endpoints may be old or new ids in any
    * mix. Contract mirrors [[Dedup.incrementalComponents]]: pairs are
    * value-facts, replays converge, label canonicality = min member id.
    * Batches under [[MaxLocalRootEdges]] take [[applyBatchLocal]]'s
    * driver-side fast path (identical table states, a fraction of the
    * per-trigger fixed cost); larger ones run the distributed body
    * below.
    */
  def applyBatch(
      spark: SparkSession, labelsTable: String, forwardTable: String,
      newIds: DataFrame, idCol: String, newPairs: DataFrame,
      buckets: Int = 4, parts: Int = 4,
      maxLocalRootEdges: Int = MaxLocalRootEdges): Unit = {
    val ids = newIds.select(col(idCol))
    if (applyBatchLocal(spark, labelsTable, forwardTable, ids, idCol,
        newPairs, buckets, parts, maxLocalRootEdges)) return
    val endpoints = newPairs.select(col("id_a").as(idCol))
      .unionByName(newPairs.select(col("id_b").as(idCol)))
      .unionByName(ids).distinct()
      .localCheckpoint() // feeds three joins + the pruned read below
    val labExists = spark.catalog.tableExists(labelsTable)
    // the ONLY read of the big table, partition-pruned to the batch's
    // endpoints' routing partitions; trimmed to endpoint rows at once so
    // downstream joins are batch×batch
    val storedEp =
      if (labExists)
        Store.readForKeys(spark, labelsTable, endpoints)
          .join(endpoints, Seq(idCol), "left_semi")
          .localCheckpoint()
      else endpoints.select(col(idCol), col(idCol).as("component")).filter(lit(false))
    val fwdExists = spark.catalog.tableExists(forwardTable)
    val fwd =
      if (fwdExists) Store.read(spark, forwardTable).localCheckpoint()
      else endpoints.select(col(idCol).as("old_root"), col(idCol).as("root"))
        .filter(lit(false))
    // current root per endpoint: stored label → one forward hop; an
    // unlabeled (new) id is its own root
    val epRoot = endpoints
      .join(storedEp, Seq(idCol), "left")
      .join(broadcast(fwd.withColumnRenamed("old_root", "component")),
        Seq("component"), "left")
      .select(col(idCol),
        coalesce(col("root"), col("component"), col(idCol)).as("__root"))
      .localCheckpoint()
    val rootPairs = newPairs
      .join(epRoot.withColumnRenamed(idCol, "id_a").withColumnRenamed("__root", "__ra"),
        Seq("id_a"))
      .join(epRoot.withColumnRenamed(idCol, "id_b").withColumnRenamed("__root", "__rb"),
        Seq("id_b"))
      .select(col("__ra").as("id_a"), col("__rb").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // CC over the ROOT graph — batch-sized by construction; min-label
    // canonicality gives the merged component its global min id. A
    // micro-batch root graph is usually TINY (≤ the batch's pair count),
    // where the iterative distributed CC pays several join+checkpoint
    // rounds of pure scheduling overhead (~3.5 s/trigger measured at the
    // q202 gate for a 75-edge graph) — so graphs under the local cap run
    // a driver-side union-find instead (one bounded collect, the
    // centroids/BPE-top-k rule), and anything larger falls back to the
    // distributed fixpoint unchanged.
    val merges = localMerges(rootPairs, maxLocalRootEdges).getOrElse(
      Dedup.connectedComponents(rootPairs)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("old_root"), col("component").as("root"))
        .localCheckpoint()) // reused thrice; tiny (≤ batch roots)
    // forward stays fully resolved: entries whose TARGET merged re-point
    // in the same commit (one-hop invariant), new entries land resolved.
    // Both update frames are join-derived and consumed by THREE actions
    // each (isEmpty + the upsert's stats job + its write) — checkpoint
    // once so the joins run once, not three times per trigger.
    val retarget = fwd.as("f")
      .join(broadcast(merges).as("m"), col("f.root") === col("m.old_root"))
      .select(col("f.old_root"), col("m.root").as("root"))
    val fwdUp = merges.unionByName(retarget).localCheckpoint()
    if (fwdExists) {
      if (!fwdUp.isEmpty) Store.upsert(spark, forwardTable, fwdUp, "old_root", buckets)
    } else if (!fwdUp.isEmpty)
      Store.bulkWrite(fwdUp, forwardTable, "old_root", buckets = buckets, parts = parts)
    // label rows ONLY for this batch's genuinely-new docs (a replayed
    // batch anti-joins away); their root maps through the fresh merges
    val newLabels = ids
      .join(storedEp.select(col(idCol)), Seq(idCol), "left_anti")
      .join(epRoot, Seq(idCol))
      .join(broadcast(merges.withColumnRenamed("old_root", "__root")),
        Seq("__root"), "left")
      .select(col(idCol), coalesce(col("root"), col("__root")).as("component"))
      .localCheckpoint() // same three-consumer rule as fwdUp
    if (labExists) {
      if (!newLabels.isEmpty) Store.upsert(spark, labelsTable, newLabels, idCol, buckets)
    } else if (!newLabels.isEmpty)
      Store.bulkWrite(newLabels, labelsTable, idCol, buckets = buckets, parts = parts)
  }

  /** Flatten pending forwards into the label table and clear them — the
    * maintenance half ([[Store.compact]]'s amortization rule: one
    * O(table) read, O(affected) write, every `compactEvery` batches, so
    * the forward frame stays broadcast-small). Idempotent, crash-safe
    * (see the object doc: folded labels are never forward keys).
    */
  def fold(
      spark: SparkSession, labelsTable: String, forwardTable: String,
      idCol: String, buckets: Int = 4): Unit = {
    if (!spark.catalog.tableExists(forwardTable) ||
      !spark.catalog.tableExists(labelsTable)) return
    // broadcast-small by contract → localized (r17): the reads/joins
    // below run against driver-resident rows and the delete's keys stay
    // local, so its stats and routing run in-process
    val fwd = Store.localized(Store.read(spark, forwardTable))
    if (fwd.isEmpty) return
    val affected = Store.localized(Store.read(spark, labelsTable)
      .join(broadcast(fwd.withColumnRenamed("old_root", "component")),
        Seq("component"))
      .select(col(idCol), col("root").as("component")))
      // materialized before upserting the table it reads
    if (!affected.isEmpty)
      Store.upsert(spark, labelsTable, affected, idCol, buckets)
    Store.delete(spark, forwardTable, fwd.select(col("old_root")), "old_root", buckets)
  }
}
