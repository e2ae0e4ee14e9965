package graft.tools

/** Batch plan/timing audit for optimization A/Bs: one JVM, many queries.
  * Usage: runMain graft.tools.PlanDump <outDir> <sfDir> <reps> <q1> <q2> ...
  *
  * Per query: writes `<outDir>/<name>.txt` with the `.explain("formatted")`
  * output (the committed plans/rNN evidence), then runs `reps` noop-sink
  * executions printing per-rep wall + the drift-immune plan-metric deltas
  * (jobs/stages/tasks/shuffle bytes — the graft.Bench listener). Cache and
  * persisted RDDs are cleared between reps exactly like Bench so numbers
  * compare to the battery records.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val reps = args(2).toInt
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new graft.Bench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      // queries that materialize during construction (persist/localCheckpoint
      // pipelines) leave cached state behind — clear before timing
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
      (1 to reps).foreach { i =>
        val before = metrics.quiesce()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val d = metrics.quiesce().zip(before).map { case (a, b) => a - b }
        println(f"[plandump] $name rep$i $secs%.3f s jobs=${d(0)} stages=${d(1)} " +
          f"tasks=${d(2)} shR=${d(3)} shW=${d(4)}")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
