package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("scan-local signatures are bit-identical to the shingle-shuffle pipeline") {
    val rnd = new scala.util.Random(31)
    val words = Seq("the", "quick", "brown", "fox", "jumps", "lazy", "dog", "Zeta")
    val docs = ((0L until 30L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(18))(words(rnd.nextInt(words.length))).mkString(" "))
    } ++ Seq(
      (100L, "only two"),            // < 3 tokens: absent from both forms
      (101L, "  padded   doc here "),
      (102L, "dup dup dup dup dup")))
      .toDF("doc_id", "text")
    val composed = Dedup.minhashSignatures(
        Dedup.wordShingles(docs, "doc_id", "text", w = 3), "doc_id", k = 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    val scanLocal = Dedup.minhashSignaturesScanLocal(docs, "doc_id", "text", k = 4, w = 3)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    assert(scanLocal === composed)
    assert(!scanLocal.contains(100L), "short docs absent, like the composed form")
  }

  test("portableHash32 matches Dedup.portableHash for unicode shingles") {
    val shingles = Seq("a b c", "é ünï c", "x y z")
    val viaSql = shingles.toDF("shingle")
      .select(Dedup.portableHash(col("shingle"), "mh2")).as[Long].collect().toSeq
    assert(viaSql === shingles.map(MinHashSigExpr.portableHash32("mh2", _)))
  }

  test("no shuffle below the signature projection (scan-local plan)") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Dedup.minhashSignaturesScanLocal(docs, "doc_id", "text", k = 4, w = 3)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"signature computation must not shuffle:\n$plan")
  }

  test("SQL registry path + null/short-doc handling") {
    val sig = spark.sql("SELECT minhash_sig('a b c d', 2, 3)").head().getSeq[Long](0)
    assert(sig.length === 2)
    val r = spark.sql("SELECT minhash_sig('too short', 2, 3)").head()
    assert(r.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig('a b c', 0, 3)").collect()
    }
  }
}
