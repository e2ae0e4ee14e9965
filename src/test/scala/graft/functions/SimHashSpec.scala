package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  /** The composed explode → 60-column-vote pipeline the native expression
    * replaced — kept as the bit-exactness reference (the q29 oracle's SQL
    * twin replicates exactly this construction).
    */
  private def composedSimhash(docs: DataFrame): DataFrame = {
    val toks = split(lower(regexp_replace(col("text"), "\\s+", " ")), " ")
    val withHash = docs.select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val bitCols = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val sums = withHash.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 60)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  test("native sim_hash is bit-identical to the composed vote pipeline") {
    val rnd = new scala.util.Random(21)
    val words = Seq("alpha", "beta", "gamma", "delta", "repeat", "Token", "x1")
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" "))
    } ++ Seq(
      (100L, "  leading spaces doc"),
      (101L, "trailing doc  "),
      (102L, "MiXeD Case TOKENS"),
      (103L, "single"),
      (104L, "dup dup dup dup"))
    val df = docs.toDF("doc_id", "text")
    val native = graft.ops.Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = composedSimhash(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
  }

  test("tokenHash60 equals the 15-hex-digit md5 prefix") {
    Seq("", "a", "hello", "tökén").foreach { tok =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      assert(SimHashExpr.tokenHash60(tok) === java.lang.Long.parseLong(hex, 16),
        s"mismatch for token '$tok'")
    }
  }

  test("SQL registry path works; signature fits in 60 bits; null propagates") {
    val sig = spark.sql("SELECT sim_hash('hello world hello')").head().getLong(0)
    assert(sig >= 0L && sig < (1L << 60))
    val r = Seq(Option.empty[String]).toDF("text")
      .select(SimHashExpr.sim_hash($"text")).head()
    assert(r.isNullAt(0))
  }

  test("only (id, simhash) crosses the shuffle in the candidate pipeline") {
    val df = Seq.tabulate(20)(i => (i.toLong, s"shared body text unique$i")).toDF("doc_id", "text")
    val cands = graft.ops.Dedup.simhashCandidates(
      graft.ops.Dedup.simhash(df, "doc_id", "text"), "doc_id", maxHamming = 3)
    val plan = cands.queryExecution.sparkPlan.toString
    val exchange = plan.linesIterator.dropWhile(!_.contains("Exchange")).take(3).mkString("\n")
    assert(!exchange.contains("text#") && !exchange.contains("tok#"),
      s"token/body data crosses the shuffle:\n$exchange")
  }
}
