package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String): Long = RollingHash.hashBytes(s.getBytes("UTF-8"))

  test("Column API matches the reference implementation (codegen path)") {
    val inputs = Seq("", "a", "hello world", "é accenté ünïcode", "x" * 10000)
    val got = inputs.toDF("s")
      .select(RollingHash.rolling_hash($"s"))
      .as[Long].collect()
    assert(got.toSeq === inputs.map(ref))
  }

  test("registered SQL function works via GraftExtensions") {
    val got = spark.sql("SELECT rolling_hash('hello world')").head().getLong(0)
    assert(got === ref("hello world"))
  }

  test("null propagates, non-string input is rejected at analysis") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(RollingHash.rolling_hash($"s")).head()
    assert(r.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT rolling_hash(42)").collect()
    }
  }

  test("whole-stage codegen and interpreted eval agree") {
    val df = Seq.tabulate(64)(i => s"doc $i payload with content $i").toDF("s")
    val codegen = df.select(RollingHash.rolling_hash($"s")).as[Long].collect().toSeq
    val interp = df.collect().map(r => ref(r.getString(0))).toSeq
    assert(codegen === interp)
  }
}
