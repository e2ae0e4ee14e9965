package graft

/** Plan-audit tool: run one query N times and dump its formatted physical
  * plan. Usage: runMain graft.Explain <queryName> [sfDir] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    fn(spark, sfDir).show(5, truncate = false) // S9 console sink

    // SPARK_GRAFT_COLD=1: clear the cache between reps (bench-like cold
    // runs); default keeps caches (steady-state comparisons).
    val cold = sys.env.get("SPARK_GRAFT_COLD").contains("1")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
      if (cold) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
