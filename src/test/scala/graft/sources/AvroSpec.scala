package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  test("round-trips every supported primitive, including NULLs and binary payloads") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("p", BinaryType)))
    val rows = Seq(
      Row(1L, 7, 2.5, 1.25f, "hello", true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -4, -0.125, 8f, "", false, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("avrospec").toString + "/d"
    try {
      AvroIO.writeAvro(df, dir)
      val back = AvroIO.readAvro(spark, dir, schema)
        .collect().sortBy(_.getLong(0))
      assert(back.length === 3)
      assert(back(0).getLong(0) === 1L && back(0).getInt(1) === 7 &&
        back(0).getDouble(2) === 2.5 && back(0).getFloat(3) === 1.25f &&
        back(0).getString(4) === "hello" && back(0).getBoolean(5) &&
        back(0).getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
      assert((1 to 6).forall(back(1).isNullAt))
      assert(back(2).getString(4) === "" &&
        back(2).getAs[Array[Byte]](6).isEmpty)
    } finally rmTree(new java.io.File(dir).getParentFile)
  }

  test("reading with a misnamed declared column fails loudly, never silently NULL") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "x")), 1), schema)
    val dir = java.nio.file.Files.createTempDirectory("avromiss").toString + "/d"
    try {
      AvroIO.writeAvro(df, dir)
      val typoed = StructType(Seq(
        StructField("id", LongType), StructField("sx", StringType)))
      val e = intercept[org.apache.spark.SparkException] {
        AvroIO.readAvro(spark, dir, typoed).collect()
      }
      assert(e.getMessage.contains("sx") ||
        Option(e.getCause).exists(_.getMessage.contains("sx")))
    } finally rmTree(new java.io.File(dir).getParentFile)
  }

  test("nested types fail loudly instead of writing wrong data") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(LongType))))
    val e = intercept[RuntimeException] { AvroIO.avroSchemaJson(nested) }
    assert(e.getMessage.contains("flat primitive"))
  }
}
