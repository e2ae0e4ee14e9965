package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the feature-hashing embedder: bit-parity with the composed
  * built-ins formulation, codegen/eval agreement, and the text → vector →
  * ANN composition (a duplicate document's top-1 knn neighbor is its twin).
  */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta gamma alpha"),                   // exact dup of 1
    (3L, "completely different words entirely here today"),
    (4L, "  leading and   trailing   whitespace runs  "),
    (5L, "")).toDF("doc_id", "text")

  test("hash_embed equals the composed explode/groupBy formulation bucket-for-bucket") {
    val dim = 16
    val got = docs.select($"doc_id",
      HashEmbedExpr.hash_embed($"text", lit(dim)).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // composed twin: canonical tokens (keeping empties), md5-prefix bucket,
    // 9th-hex-digit-parity sign, per-bucket integer sum
    val composed = docs
      .select($"doc_id",
        explode(split(lower(regexp_replace($"text", "\\s+", " ")), " ", -1)).as("tok"))
      .select($"doc_id",
        (conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % dim).as("bucket"),
        when(conv(substring(md5($"tok"), 9, 1), 16, 10) % 2 === 0, 1)
          .otherwise(-1).as("sign"))
      .groupBy($"doc_id", $"bucket").agg(sum($"sign").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val emb = got(id)
      assert(emb.length === dim)
      (0 until dim).foreach { b =>
        assert(emb(b) === composed.getOrElse((id, b), 0),
          s"doc $id bucket $b: native ${emb(b)} vs composed ${composed.getOrElse((id, b), 0)}")
      }
    }
    // duplicate texts embed identically; total mass is bounded by tokens
    assert(got(1L) === got(2L))
    assert(got(1L).map(math.abs).sum <= 4)
  }

  test("whole-stage codegen and interpreted eval agree") {
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try docs.select($"doc_id", HashEmbedExpr.hash_embed($"text", lit(32)))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("text -> hashed embedding -> knn join: a duplicate's top-1 is its twin") {
    import graft.ops.Similarity
    val vecs = docs.filter(length($"text") > 0)
      .select($"doc_id",
        transform(HashEmbedExpr.hash_embed($"text", lit(64)), x => x.cast("double"))
          .as("embedding"))
    val top1 = Similarity.knnJoinLsh(vecs, "doc_id", "embedding", k = 1)
      .collect().map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))).toMap
    // docs 1 and 2 are verbatim duplicates: identical vectors, cosine 1
    // (to a sqrt rounding ulp — d/(√n·√n) is not exactly 1.0 in floats)
    assert(top1(1L)._1 === 2L && math.abs(top1(1L)._2 - 1.0) < 1e-12)
    assert(top1(2L)._1 === 1L && math.abs(top1(2L)._2 - 1.0) < 1e-12)
  }
}
