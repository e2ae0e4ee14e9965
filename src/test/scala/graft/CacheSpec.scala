package graft

/** Library-hygiene regression: operators and composed queries that persist
  * intermediate frames internally (loop leaves, stage boundaries, overlap
  * matrices) must RELEASE them before returning — a long-lived session
  * calling them as library functions must not accumulate cached plans
  * (VERDICT r8 wrong #2). The bench/Verify harnesses clear the cache per
  * run, so only a spec catches this class of leak.
  */
class CacheSpec extends SparkSpec {

  private val leakProne = Seq(
    "q108_semdedup",             // SemDeDup sketch-bucket join
    "q120_curation_pipeline_r8", // three stage-boundary persists
    "q130_source_pagerank",      // PageRank loop leaves
    "q131_acquisition_plan",     // overlap matrix + both PageRank variants
    "q134_source_pagerank_weighted",
    "q136_pagerank_converged",   // per-round checkpoints + loop leaves
    "q139_pagerank_weighted_converged")

  leakProne.foreach { name =>
    test(s"$name leaves no cached plans after a standalone run") {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sf("sf0.001")).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left persisted plans behind")
    }
  }
}
