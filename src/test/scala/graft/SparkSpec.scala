package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (per-suite sessions would
  * pay ~5 s JVM/codegen warm-up each).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4)
    // iterative ML (ALS) truncates its lineage only when a checkpoint dir
    // exists; without one, >~20 iterations build a serialized lineage deep
    // enough to StackOverflow at task deserialization
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("spec-ckpt").toString)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
