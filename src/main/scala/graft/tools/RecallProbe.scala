package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** ANN tuning diagnostic: recall-vs-brute of the LSH and IVF paths at a
  * given scale. Usage: runMain graft.tools.RecallProbe [sfDir]
  * (The gate queries assert recall >= a pinned threshold; pin thresholds
  * from what this prints, with margin.)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(probes, e, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("neighbor_id"))

    def report(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val perQ = approx.select(col("q_id"), col("neighbor_id")).as("l")
        .join(brute.as("b"), Seq("q_id", "neighbor_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_matched"))
      println(s"== $name ==")
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_brute"))
        .join(perQ, Seq("q_id"), "left")
        .withColumn("recall", coalesce(col("n_matched"), lit(0L)).cast("double") / col("n_brute"))
        .orderBy(col("q_id"))
        .show(100, truncate = false)
    }

    report("LSH (8 planes, 4 tables)",
      Similarity.lshTopK(probes, e, "vec_id", "embedding", k = 5))
    report("IVF (16 cells, nProbe 4)",
      Similarity.ivfTopK(probes, e, "vec_id", "embedding", k = 5))
    spark.stop()
  }
}
