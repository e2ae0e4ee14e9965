package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest/egest — the remaining mainstream columnar/row
  * interchange format after parquet (q132) and ORC (q142). The environment
  * ships Avro CORE (`avro`, `avro-mapred`) but NOT the `spark-avro`
  * DataSource connector, so this adapter speaks the Hadoop mapreduce
  * `AvroKey{Input,Output}Format` directly and converts rows at the
  * partition boundary — the documented fallback when the connector jar is
  * absent; swap `spark.read.format("avro")` in where it exists, the schema
  * contract is identical. This is one of the engine's two justified RDD
  * touch-points (the builder-prompt rule: RDDs only for genuine
  * per-partition imperative logic — here, a missing DataSource).
  *
  * Determinism/portability notes:
  *  - the Avro schema travels as its JSON STRING and is re-parsed inside
  *    each task (`Schema` is not serializable);
  *  - readers hand back `Utf8` for strings and may box numerics — the
  *    converter normalizes per the DECLARED Spark schema, so the round
  *    trip is column-type exact (the q195 gate hash-matches the parquet
  *    route);
  *  - only the flat primitive shapes the corpus tables use are mapped
  *    (long/int/double/string/binary/boolean, each nullable via the
  *    standard `["null", T]` union). Nested records are out of scope until
  *    a real connector is available — fail loudly, not wrongly.
  */
object AvroIO {

  /** Spark schema → Avro record schema JSON (nullable primitives only). */
  def avroSchemaJson(schema: StructType, name: String = "graft_record"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType    => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType  => "\"double\""
      case FloatType   => "\"float\""
      case StringType  => "\"string\""
      case BooleanType => "\"boolean\""
      case BinaryType  => "\"bytes\""
      case other => sys.error(
        s"AvroIO maps flat primitive columns only; got $other — " +
          "restructure or use a real spark-avro connector")
    }
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Write `df` as Avro container files under `outDir` (one file per
    * partition, the standard Hadoop output layout). Distributed: each task
    * serializes its own partition; nothing funnels through the driver.
    */
  def writeAvro(df: DataFrame, outDir: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    val fieldNames = sparkSchema.fieldNames
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(json)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldNames.length) {
          val v = row.get(i) match {
            case null              => null
            case b: Array[Byte]    => java.nio.ByteBuffer.wrap(b)
            case other             => other
          }
          rec.put(fieldNames(i), v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      outDir,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files under `dir` into a DataFrame with the
    * DECLARED Spark schema (names select fields; types drive the
    * normalization — `Utf8` → String, `ByteBuffer` → bytes, numeric
    * widening per the declared column).
    */
  def readAvro(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val fieldNames = schema.fieldNames
    val kinds: Array[String] = schema.fields.map(_.dataType match {
      case LongType    => "long"
      case IntegerType => "int"
      case DoubleType  => "double"
      case FloatType   => "float"
      case StringType  => "string"
      case BooleanType => "boolean"
      case BinaryType  => "binary"
      case other       => sys.error(s"AvroIO cannot read into $other")
    })
    val rows = spark.sparkContext.newAPIHadoopFile(
        dir,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .mapPartitions { pairs =>
        var checked = false
        pairs.map { case (k, _) =>
          val rec = k.datum()
          // declared-vs-file name check, once per partition: Avro's
          // Record.get(name) returns null for an UNKNOWN field, which
          // would silently read a typo'd column as all-NULL — the one
          // mismatch the type mapping can't catch (code-review r13 #2)
          if (!checked) {
            val fileSchema = rec.getSchema
            fieldNames.foreach(n => require(fileSchema.getField(n) != null,
              s"declared column '$n' is not a field of the Avro file schema " +
                s"(has: ${scala.jdk.CollectionConverters.ListHasAsScala(
                  fileSchema.getFields).asScala.map(_.name).mkString(", ")})"))
            checked = true
          }
          val vals = new Array[Any](fieldNames.length)
          var i = 0
          while (i < fieldNames.length) {
            val raw = rec.get(fieldNames(i))
            vals(i) =
              if (raw == null) null
              else kinds(i) match {
                case "string"  => raw.toString
                case "long"    => raw.asInstanceOf[java.lang.Number].longValue()
                case "int"     => raw.asInstanceOf[java.lang.Number].intValue()
                case "double"  => raw.asInstanceOf[java.lang.Number].doubleValue()
                case "float"   => raw.asInstanceOf[java.lang.Number].floatValue()
                case "boolean" => raw.asInstanceOf[java.lang.Boolean].booleanValue()
                case "binary" =>
                  val bb = raw.asInstanceOf[java.nio.ByteBuffer]
                  val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
              }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
