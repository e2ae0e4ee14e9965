package graft

/** Benchmark main: per query, three timed runs with the cache cleared
  * after every run (queries that persist internally — q24/q26/q29 — would
  * otherwise accumulate cached partitions across the whole battery and
  * bleed GC pressure into unrelated timings; VERDICT r3 measured a trivial
  * 10-group aggregate at 7.8 s from exactly that). The reported figure is
  * the MEDIAN of the three runs (run 1 absorbs codegen compile, so the
  * median is a steady-state number), plus a max−min spread so noise is
  * visible instead of read as regression. Single-line JSON on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      finally spark.catalog.clearCache() // outside the timed region next run starts from
    }

    // UNTIMED warmups before the battery: the first query otherwise
    // absorbs executor spin-up + first-codegen costs in its spread (r4
    // measured q01 spread at 4.4 s from exactly this), and the queries
    // backed by once-per-JVM OFFLINE artifacts (stored IVF index, ALS
    // serving table, posting index, recall fixture) otherwise book the
    // index build into rep 1's spread. Builds are jobs, not query cost;
    // spread_sec should read as steady-state noise.
    val offlineBacked = Set(
      "q38_ann_ivf_topk", "q58_ml_rec_serving",
      "q67_ml_search_posting", "q68_ann_recall_clustered")
    (qs.take(1) ++ qs.filter(q => offlineBacked(q._1))).foreach(q => once(q._2))

    val results = qs.map { case (name, fn) =>
      val runs = (1 to reps).map(_ => once(fn))
      System.gc() // keep one query's garbage out of the next query's timing
      val times = runs.collect { case Right(s) => s }.sorted
      val outcome =
        if (times.isEmpty) Left(runs.collectFirst { case Left(m) => m }.getOrElse("?"))
        else Right((times(times.size / 2), times.last - times.head))
      name -> outcome
    }

    val timings = results.map {
      case (k, Right((med, _))) => s""""$k":$med"""
      case (k, Left(_))         => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val spreads = results.collect { case (k, Right((_, sp))) =>
      s""""$k":${math.rint(sp * 1000) / 1000}"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(msg)) =>
      s""""$k":"${msg.replaceAll("[\\x00-\\x1f\"\\\\]", " ").take(120)}""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right((med, _))) => med }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$timings,"spread_sec":$spreads,"errors":$errs,"reps":$reps,"sf":"$sfDir"}"""
    println(line)
    // Durable copy: the driver preserves only a stdout TAIL, which has
    // twice truncated the per-query map out of the round record (r4, r6).
    // The full JSON always lands in a file too.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_last.json")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outFile).getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
    if (results.exists(_._2.isLeft)) sys.exit(1)
  }
}
