package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** INTERLEAVED A/B for the q130/q131 shingle front (r20 — VERDICT r19
  * next #1): the driver's r19 record walled q130 at 0.17× and q131 at
  * 0.24× after the r19 shingle changes, while every structural metric
  * improved and the driver's own 8-core run contradicted the walls. This
  * tool settles it: per rep it runs the CURRENT declared query and an
  * R18-RECONSTRUCTED variant (shingle STRINGS as shuffle keys + the
  * global `.distinct()` the r19 change removed) back to back in one JVM,
  * alternating order across reps so drift cannot systematically favor
  * either side. Dev-only — the declared queries are untouched.
  *
  * Usage: runMain graft.tools.ShingleAb <sfDir> <pairs>
  */
object ShingleAb {

  /** The r18 shingle front: explode WITHOUT the scan-local
    * array_distinct, global distinct on the STRING pairs.
    */
  private def oldSourceShingles(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(graft.functions.WordShinglesExpr.word_shingles(col("text"), lit(3)))
          .as("shingle"))
      .distinct()

  private def oldOverlapMatrix(docs: DataFrame): DataFrame = {
    val srcSh = oldSourceShingles(docs)
    val sizes = srcSh.groupBy(col("source")).agg(count(lit(1)).as("__sz"))
    val a = srcSh.select(col("source").as("src_a"), col("shingle"))
    val b = srcSh.select(col("source").as("src_b"), col("shingle"))
    a.join(b, "shingle")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes).select(col("source").as("src_a"), col("__sz").as("sz_a")), "src_a")
      .join(broadcast(sizes).select(col("source").as("src_b"), col("__sz").as("sz_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("sz_a"), col("sz_b"),
        round(col("n_shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_shared")).cast("double"), 4).as("jaccard"))
  }

  private def oldQ130(s: SparkSession, dir: String): DataFrame = {
    val m = oldOverlapMatrix(graft.Tables.documents(s, dir))
    val sym = m.select(col("src_a").as("src"), col("src_b").as("dst"), col("n_shared"))
      .unionByName(
        m.select(col("src_b").as("src"), col("src_a").as("dst"), col("n_shared")))
    val w = Window.partitionBy(col("src")).orderBy(col("n_shared").desc, col("dst"))
    val edges = sym.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3).select(col("src"), col("dst"))
    graft.ops.Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 3)
      .orderBy(col("node"))
  }

  private def oldQ131(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    val m = oldOverlapMatrix(docs).persist()
    val sym = m.select(col("src_a").as("src"), col("src_b").as("dst"),
        col("n_shared"), col("jaccard"))
      .unionByName(m.select(col("src_b").as("src"), col("src_a").as("dst"),
        col("n_shared"), col("jaccard")))
    val wnd = Window.partitionBy(col("src")).orderBy(col("n_shared").desc, col("dst"))
    val edges = sym.withColumn("__rn", row_number().over(wnd))
      .filter(col("__rn") <= 3).select(col("src"), col("dst"), col("n_shared"))
    val pr = graft.ops.Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 3)
    val prw = graft.ops.Graph.pageRankWeightedFixedPoint(edges, "src", "dst", "n_shared",
        iterations = 3)
      .select(col("node").as("source"), col("rank_fp").as("rank_fp_weighted"))
    val red = sym.groupBy(col("src").as("source")).agg(max(col("jaccard")).as("max_jaccard"))
    // r18 novelty front: STRING shingles, global distinct absent here too
    // (the novelty joins never had one; only the key type differs)
    val novSh = graft.ops.Dedup.wordShingles(docs, "doc_id", "text", w = 3)
    val nov = novSh
      .join(novSh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_id")),
        "shingle")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(round(
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 4).as("novelty_rate"))
    val weights = (0 until 20).map(i => s"src$i" -> (i + 1) / 210.0).toMap
    val plan = graft.ops.Training.mixtureEpochs(docs, "source", "n_chars", weights,
        budgetFactor = 2.0, maxEpochs = 2.0)
      .join(pr.withColumnRenamed("node", "source"), "source")
      .join(prw, "source")
      .join(red, "source")
      .join(nov, "source")
      .orderBy(col("source"))
      .localCheckpoint()
    m.unpersist()
    plan
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pairs = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new graft.Bench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q130_new" -> graft.SparkEntry.queries("q130_source_pagerank"),
      "q130_old" -> (oldQ130 _),
      "q131_new" -> graft.SparkEntry.queries("q131_acquisition_plan"),
      "q131_old" -> (oldQ131 _))

    def runOne(tag: String, fn: (SparkSession, String) => DataFrame): Unit = {
      val before = metrics.quiesce()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val d = metrics.quiesce().zip(before).map { case (a, b) => a - b }
      println(f"[ab] $tag $secs%.3f s jobs=${d(0)} stages=${d(1)} tasks=${d(2)} " +
        f"shR=${d(3)} shW=${d(4)} load=${java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/loadavg")).split(" ").head}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
      System.gc()
    }

    // untimed warmup of each variant (codegen compile), then interleave,
    // flipping order each pair so drift cannot favor a side
    variants.foreach { case (tag, fn) => runOne(s"warmup_$tag", fn) }
    (1 to pairs).foreach { i =>
      val ordered = if (i % 2 == 1) variants else variants.reverse
      ordered.foreach { case (tag, fn) => runOne(s"pair$i/$tag", fn) }
    }
    spark.stop()
  }
}
