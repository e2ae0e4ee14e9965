package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.getMessage.take(500)) }
    spark.stop()
  }
}
