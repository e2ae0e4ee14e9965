package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the NFC normalization expression ([[NfcNormalizeExpr]]):
  * canonical equivalence classes collapse, already-normalized strings
  * pass through untouched, idempotence, null propagation, and SQL
  * registration.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"        // é as U+00E9
  private val decomposed = "cafe\u0301"     // e + combining acute U+0301

  test("canonically-equivalent forms normalize to identical bytes") {
    val got = Seq(composed, decomposed).toDF("s")
      .select(NfcNormalizeExpr.nfc_normalize($"s").as("n"))
      .as[String].collect().toSeq
    assert(got(0) === got(1), "composed and decomposed é must normalize equal")
    assert(got(0) === composed, "NFC composes, so the composed form is the fixpoint")
  }

  test("ASCII and already-NFC inputs pass through; normalize is idempotent") {
    val inputs = Seq("", "plain ascii", composed, "mixed ü and text")
    val once = inputs.toDF("s")
      .select(NfcNormalizeExpr.nfc_normalize($"s").as("n")).as[String].collect().toSeq
    assert(once === inputs, "already-normalized strings must be unchanged")
    val twice = once.toDF("s")
      .select(NfcNormalizeExpr.nfc_normalize($"s").as("n")).as[String].collect().toSeq
    assert(twice === once)
  }

  test("kernel, codegen path, and SQL registration agree; null propagates") {
    val inputs = Seq(composed, decomposed, "åb", "x")
    val viaDf = inputs.toDF("s")
      .select(NfcNormalizeExpr.nfc_normalize($"s")).as[String].collect().toSeq
    val viaKernel = inputs.map(s => NfcNormalizeExpr.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaDf === viaKernel)
    val viaSql = spark.sql(s"SELECT nfc_normalize('$decomposed')").head().getString(0)
    assert(viaSql === composed)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(NfcNormalizeExpr.nfc_normalize($"s")).head()
    assert(n.isNullAt(0))
  }
}
