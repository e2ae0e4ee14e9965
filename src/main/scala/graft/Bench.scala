package graft

/** Benchmark main: one warm-up + one timed run per query (cold JVM/codegen
  * warm-up would otherwise dominate — VERDICT.md r1), per-query ok/err
  * status, single-line JSON on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var anyErr = false
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      }
      once() // warm-up: session/codegen/scan caches
      val timed = once()
      if (timed.isLeft) anyErr = true
      name -> timed
    }
    val qs = results.map {
      case (k, Right(sec)) => s""""$k":$sec"""
      case (k, Left(_))    => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(msg)) =>
      s""""$k":"${msg.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)}""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(s)) => s }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (anyErr) sys.exit(1)
  }
}
