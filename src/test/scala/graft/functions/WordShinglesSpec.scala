package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The composed-built-ins chain the native expression replaced — kept as
    * the semantics reference (the DuckDB oracle twins mirror it).
    */
  private def hofShingles(textCol: org.apache.spark.sql.Column, w: Int) = {
    val toks = split(lower(regexp_replace(textCol, "\\s+", " ")), " ")
    when(size(toks) >= w,
      transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
      .otherwise(array())
  }

  test("native word_shingles matches the composed HOF chain, including edges") {
    val inputs = Seq(
      "plain three word doc",
      "  leading whitespace run",
      "trailing run   ",
      "CASE Folding MiXeD",
      "tabs\tand\nnewlines\r\nhere",
      "multi   internal    runs",
      "two words",
      "one",
      "",
      "   ",
      "é unicode tökens here",
      "a b c d e f g h")
    val df = inputs.toDF("text")
    val rows = df.select(
      WordShinglesExpr.word_shingles($"text", lit(3)).as("native"),
      hofShingles($"text", 3).as("hof")).collect()
    inputs.zip(rows).foreach { case (in, r) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"mismatch for input: '$in'")
    }
  }

  test("width 1 and width > token count behave like the HOF chain") {
    val df = Seq("alpha beta gamma").toDF("text")
    val r1 = df.select(
      WordShinglesExpr.word_shingles($"text", lit(1)).as("n"),
      hofShingles($"text", 1).as("h")).head()
    assert(r1.getSeq[String](0) === r1.getSeq[String](1))
    val r9 = df.select(WordShinglesExpr.word_shingles($"text", lit(9))).head()
    assert(r9.getSeq[String](0).isEmpty)
  }

  test("null text yields null; bad width rejected at analysis") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(WordShinglesExpr.word_shingles($"text", lit(3))).head()
    assert(r.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles('a b c', 0)").collect()
    }
  }

  test("whole-stage codegen and interpreted eval agree") {
    val df = Seq.tabulate(64)(i => s"doc $i body with shared phrase number $i tail").toDF("s")
    val viaPlan = df.select(WordShinglesExpr.word_shingles($"s", lit(3))).collect()
      .map(_.getSeq[String](0))
    val viaKernel = df.collect().map(r =>
      WordShinglesExpr.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), 3)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq)
    assert(viaPlan.toSeq === viaKernel.toSeq)
  }

  /** The composed chunking chain `word_chunks` replaced (spanDedup's
    * original form) — kept as the semantics reference the DuckDB oracle
    * mirrors (`t[(i*w+1):(i*w+w)]` slices over generate_series).
    */
  private def hofChunks(textCol: org.apache.spark.sql.Column, w: Int) = {
    val toks = split(lower(regexp_replace(textCol, "\\s+", " ")), " ")
    transform(
      sequence(lit(0), ceil(size(toks).cast("double") / w).cast("int") - 1),
      i => concat_ws(" ", slice(toks, i * w + 1, lit(w))))
  }

  test("native word_chunks matches the composed chunking chain, including edges") {
    val inputs = Seq(
      "a b c d e f g h i j",          // even 2-chunk split at w=5
      "a b c d e f g",                // short tail chunk
      "exactly five token doc here",  // single full chunk
      "tiny",                         // single short chunk
      "",                             // empty text -> one empty token -> one chunk
      "  leading and trailing  ",
      "tabs\tand\nnewlines")
    val rows = inputs.toDF("text").select(
      WordChunksExpr.word_chunks($"text", lit(5)).as("native"),
      hofChunks($"text", 5).as("hof")).collect()
    inputs.zip(rows).foreach { case (in, r) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"mismatch for input: '$in'")
    }
    // width 1: every token its own chunk
    val r1 = Seq("x y z").toDF("text")
      .select(WordChunksExpr.word_chunks($"text", lit(1))).head()
    assert(r1.getSeq[String](0) === Seq("x", "y", "z"))
    // null text yields null; bad width rejected at analysis
    val rn = Seq(Option.empty[String]).toDF("text")
      .select(WordChunksExpr.word_chunks($"text", lit(5))).head()
    assert(rn.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_chunks('a b c', 0)").collect()
    }
  }
}
