package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Store

/** Cross-JVM persistence probe for the Derby-backed catalog
  * ([[GraftSession.persistentBuilder]]). Two invocations in SEPARATE
  * processes (StoreSpec forks them):
  *
  *   runMain graft.tools.MetastoreCheck write <dir>   — create + fill a
  *     Store table in a persistent-catalog session, then exit
  *   runMain graft.tools.MetastoreCheck read <dir>    — a FRESH process
  *     must see the table in the catalog and read the same rows back
  *     (bucket metadata included: the point lookup still prunes)
  *
  * Exit code 0 = check passed.
  */
object MetastoreCheck {
  def main(args: Array[String]): Unit = {
    val (mode, dir) = (args(0), args(1))
    val spark = GraftSession.persistentBuilder("local[2]", 4, dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ok =
      mode match {
        case "write" =>
          val df = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
          Store.bulkWrite(df, "persist_check", "k", buckets = 4)
          Store.read(spark, "persist_check").count() == 100L
        case "read" =>
          spark.catalog.tableExists("persist_check") && {
            val t = Store.read(spark, "persist_check")
            val lookup = t.filter(col("k") === 42L)
            t.count() == 100L &&
              lookup.head().getString(1) == "v42" &&
              // the catalog must restore BUCKET metadata too, or lookups
              // degrade to full scans in every later session
              lookup.queryExecution.executedPlan.toString
                .contains("SelectedBucketsCount: 1 out of 4")
          }
        case other => sys.error(s"unknown mode $other")
      }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
