package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Closed-form + parity pins for the int8 quantization expressions. */
class QuantExprsSpec extends SparkSpec {
  import spark.implicits._

  private val vec = Seq(0.0f, 1.0f, 0.5f, 0.25f)

  test("quantize_i8: closed-form codes on a [0,1] vector") {
    val got = Seq(Tuple1(vec)).toDF("v")
      .select(QuantExprs.quantize_i8($"v")).head().getSeq[Int](0)
    // mn=0, mx=1, step=1/255: 0→0, 1→255, 0.5→128 (127.5 rounds half-up),
    // 0.25→64 (63.75+0.5 floors to 64)
    assert(got === Seq(0, 255, 128, 64))
  }

  test("quant_err_i8 is bounded by half a quantization step and exact on lattice points") {
    val df = Seq(Tuple1(vec)).toDF("v")
      .select(QuantExprs.quant_err_i8($"v").as("e"))
    val e = df.head().getDouble(0)
    assert(e <= 1.0 / 255.0 / 2.0 + 1e-12)
    // a vector ON the uint8 lattice reconstructs exactly
    val lattice = Seq(Tuple1(Seq(0.0, 255.0, 51.0, 102.0))).toDF("v")
      .select(QuantExprs.quant_err_i8($"v")).head().getDouble(0)
    assert(lattice === 0.0)
  }

  test("constant vectors quantize to all-zero codes with zero error") {
    val row = Seq(Tuple1(Seq(3.25f, 3.25f, 3.25f))).toDF("v")
      .select(QuantExprs.quantize_i8($"v").as("q"), QuantExprs.quant_err_i8($"v").as("e"))
      .head()
    assert(row.getSeq[Int](0) === Seq(0, 0, 0) && row.getDouble(1) === 0.0)
  }

  test("whole-stage codegen and interpreted eval agree") {
    val data = Seq(Tuple1(Seq(-2.5f, 0.1f, 7.75f, 0.0f, -0.3f))).toDF("v")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try data.select(QuantExprs.quantize_i8($"v"), QuantExprs.quant_err_i8($"v")).head()
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val (g, i) = (run("CODEGEN_ONLY"), run("NO_CODEGEN"))
    assert(g.getSeq[Int](0) === i.getSeq[Int](0))
    assert(g.getDouble(1) === i.getDouble(1))
  }

  test("cosine_q8 equals cosine_f of the explicitly dequantized vector") {
    val q = Seq(0.3f, -1.2f, 0.8f, 2.0f)
    val v = Seq(-0.5f, 1.5f, 0.25f, 0.75f)
    val df = Seq((q, v)).toDF("q", "v")
      .select($"q", $"v",
        QuantExprs.quantize_i8($"v").as("codes"),
        array_min($"v").cast("double").as("mn"),
        array_max($"v").cast("double").as("mx"))
    val got = df.select(
      QuantExprs.cosine_q8($"q", $"codes", $"mn", $"mx")).head().getDouble(0)
    // reference: dequantize element-wise in the exact same double formula,
    // then run the ordinary fused cosine
    val expected = df.select(
      graft.functions.VectorExprs.cosine_f($"q",
        transform($"codes", c => $"mn" + c.cast("double") * ($"mx" - $"mn") / lit(255.0))))
      .head().getDouble(0)
    assert(got === expected)
    // self-similarity of a quantized vector with its own float original is
    // near 1 (reconstruction error ≤ half a step)
    val self = df.select(QuantExprs.cosine_q8($"v", $"codes", $"mn", $"mx"))
      .head().getDouble(0)
    assert(self > 0.999)
  }

  test("cosine_q8: codegen and interpreted eval agree; dimension mismatch is loud") {
    val data = Seq((Seq(1.0f, 2.0f, -3.0f), Seq(0.5f, -0.5f, 4.0f))).toDF("q", "v")
      .select($"q", QuantExprs.quantize_i8($"v").as("codes"),
        array_min($"v").cast("double").as("mn"), array_max($"v").cast("double").as("mx"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try data.select(QuantExprs.cosine_q8($"q", $"codes", $"mn", $"mx")).head()
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY").getDouble(0) === run("NO_CODEGEN").getDouble(0))
    val bad = Seq((Seq(1.0f, 2.0f), Seq(3))).toDF("q", "codes")
    intercept[Exception] {
      bad.select(QuantExprs.cosine_q8($"q", $"codes", lit(0.0), lit(1.0))).collect()
    }
  }

  test("SQL registry path works; analysis rejects non-vector types") {
    Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("v").createOrReplaceTempView("qv")
    val viaSql = spark.sql("SELECT quantize_i8(v) FROM qv").head().getSeq[Int](0)
    assert(viaSql === Seq(0, 255))
    intercept[Exception] { spark.sql("SELECT quantize_i8('nope')").collect() }
  }
}
