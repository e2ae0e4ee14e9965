package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton-curve) clustering, the
  * write-side half of multi-column file skipping.
  *
  * A table laid out by ONE sort column skips files only for predicates on
  * that column; a box query on any other dimension scans everything. The
  * Z-value interleaves the bits of several dimensions so that rows close
  * in EVERY dimension land close on a single 1-D key — bucketing by that
  * key gives each output file a tight min/max envelope in ALL the curve's
  * dimensions at once, which is exactly what scan-level min/max pruning
  * (parquet row-group stats, manifest-level file stats) needs to skip.
  *
  * Everything here is deliberately DETERMINISTIC and shuffle-free:
  *
  *  - quantization is power-of-2 equi-width (subtract the min, right-shift
  *    until the span fits the bit budget) — pure integer ops, no sampling,
  *    no floating point, so the same rows always produce the same layout
  *    and an external system (or the DuckDB oracle) can replay it bit for
  *    bit;
  *  - the file/bucket id is the Z-value's BIT PREFIX, not a rank — no
  *    global sort, no range-partitioner sampling: assigning a row to its
  *    bucket is a map-side expression, so a 100 TB re-layout is one
  *    embarrassingly-parallel pass ending in a partitioned write.
  *
  * The quantization plan (one min/max pair per dimension) is the only
  * driver-side state — a bounded aggregate of 2 longs per dim, same class
  * of collect as the k-means codebook ([[Clustering]]).
  */
object Layout {

  /** Bit-interleave pre-quantized dims (each in `[0, 2^bits)`): bit `i` of
    * dim `d` lands at position `i*n + d`. Target bits are disjoint, so the
    * OR is a sum, and the whole fold is `2·bits·n` shift/mask Columns that
    * stay inside WholeStageCodegen — no UDF, no custom expression needed.
    */
  def interleave(quantized: Seq[Column], bits: Int): Column = {
    require(quantized.nonEmpty && bits >= 1 && bits * quantized.size <= 62,
      s"interleave needs 1..62 total bits, got ${quantized.size} dims x $bits")
    val n = quantized.size
    val terms =
      for { i <- 0 until bits; d <- 0 until n }
        yield shiftleft(shiftright(quantized(d), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ + _)
  }

  /** One dimension's quantization: `q = (value - min) >> shift`, with
    * `shift` the smallest right-shift that brings the span under `2^bits`.
    */
  final case class DimSpec(name: String, min: Long, shift: Int) {
    def quantized: Column = shiftright(col(name) - lit(min), shift)
  }

  /** Smallest `s` with `(span-1) >> s < 2^bits` — exposed so the spec and
    * the SQL oracle replay the same rule (the oracle scans s = 0..62).
    */
  def shiftFor(span: Long, bits: Int): Int = {
    var s = 0
    while (((span - 1) >> s) >= (1L << bits)) s += 1
    s
  }

  /** The quantization plan: per dim, its min and the span-fitting shift.
    * ONE aggregate job, 2 longs per dim collected driver-side (bounded).
    */
  def quantizationPlan(df: DataFrame, dims: Seq[String], bits: Int): Seq[DimSpec] = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).cast("long").as(s"__mn_$d"), max(col(d)).cast("long").as(s"__mx_$d")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    dims.zipWithIndex.map { case (d, i) =>
      require(!row.isNullAt(2 * i),
        s"cannot plan a layout over '$d': no non-null values (empty input?)")
      val mn = row.getLong(2 * i)
      val mx = row.getLong(2 * i + 1)
      DimSpec(d, mn, shiftFor(mx - mn + 1, bits))
    }
  }

  /** Attach the Z-value and its prefix bucket (`2^bucketBits` buckets).
    * Map-side only: quantize (integer subtract/shift), interleave
    * (shift/mask fold), take the top `bucketBits` bits. A NULL in any
    * dimension nulls the row's z/bucket (a partitioned write lands it in
    * the Hive default-partition dir) — filter or impute nulls upstream
    * if that is not the intent.
    */
  def withZ(
      df: DataFrame, plan: Seq[DimSpec], bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= bits * plan.size,
      s"bucketBits must be in [1, ${bits * plan.size}]")
    df.withColumn("z", interleave(plan.map(_.quantized), bits))
      .withColumn("z_bucket", shiftright(col("z"), bits * plan.size - bucketBits))
  }

  /** Re-layout `df` Z-ordered on `dims`: one partitioned write, one dir per
    * Z-prefix bucket, rows inside each file sorted by the full Z-value so
    * parquet row-group stats nest inside the bucket envelope. Returns the
    * plan so callers (and readers computing skip sets) share the exact
    * quantization.
    */
  def zorderWrite(
      df: DataFrame, dims: Seq[String], outDir: String,
      bits: Int = 16, bucketBits: Int = 4): Seq[DimSpec] = {
    val plan = quantizationPlan(df, dims, bits)
    withZ(df, plan, bits, bucketBits)
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z_bucket"), col("z"))
      .write.mode("overwrite")
      .partitionBy("z_bucket")
      .parquet(outDir)
    plan
  }

  /** The Z-prefix buckets a BOX QUERY can possibly touch — the read-side
    * half of the layout, computed DRIVER-SIDE from the quantization plan
    * alone (no file listing, no stats scan): a prefix of `bucketBits`
    * bits fixes the top bits of each dimension's quantized value, which
    * defines a per-dimension cell range; a bucket survives iff every
    * dimension's cell range intersects the box's quantized range. The
    * enumeration is over `2^bucketBits` prefixes (16–4096 at sane
    * settings) — microseconds, independent of data size.
    */
  def bucketsForBox(
      plan: Seq[DimSpec], bits: Int, bucketBits: Int,
      box: Seq[(Long, Long)]): Seq[Long] = {
    require(box.size == plan.size, "one (lo, hi) bound per dimension")
    val n = plan.size
    // box bounds → quantized cell bounds (clamped into the grid)
    val qBox = plan.zip(box).map { case (sp, (lo, hi)) =>
      val maxCell = (1L << bits) - 1L
      val qlo = math.max(0L, math.min(maxCell, (lo - sp.min) >> sp.shift))
      val qhi = math.max(0L, math.min(maxCell, (hi - sp.min) >> sp.shift))
      (math.min(qlo, qhi), math.max(qlo, qhi))
    }
    (0L until (1L << bucketBits)).filter { p =>
      (0 until n).forall { d =>
        // the prefix's bits at interleaved positions >= n*bits - bucketBits
        // with position % n == d are dim d's FIXED top bits; walk z
        // positions DESCENDING so the dim's highest bit lands most
        // significant, and bit j of the prefix is z bit (base + j)
        val base = n * bits - bucketBits
        var fixed = 0L
        var numFixed = 0
        var pos = n * bits - 1
        while (pos >= base) {
          if (pos % n == d) {
            fixed = (fixed << 1) | ((p >> (pos - base)) & 1L)
            numFixed += 1
          }
          pos -= 1
        }
        val span = bits - numFixed
        val lo = fixed << span
        val hi = lo + (1L << span) - 1L
        val (blo, bhi) = qBox(d)
        hi >= blo && lo <= bhi
      }
    }
  }

  /** BOX READ over a [[zorderWrite]] layout: partition-prune to the
    * buckets [[bucketsForBox]] admits, then apply the exact per-dim
    * range filters. The scan's PartitionFilters carry the bucket set, so
    * only intersecting dirs are listed/read — the multi-dimensional file
    * skipping the layout exists for, with the residual filter keeping
    * exactness (a bucket intersecting the box still holds rows outside
    * it).
    */
  def readBox(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      plan: Seq[DimSpec], bits: Int, bucketBits: Int,
      box: Seq[(Long, Long)]): DataFrame = {
    val buckets = bucketsForBox(plan, bits, bucketBits, box)
    val pruned = spark.read.parquet(dir)
      .filter(col("z_bucket").isin(buckets: _*))
    plan.zip(box).foldLeft(pruned) { case (df, (sp, (lo, hi))) =>
      df.filter(col(sp.name) >= lo && col(sp.name) <= hi)
    }
  }

  /** Per-bucket layout manifest: row count and each dimension's min/max
    * envelope — the file-stats table a scan planner prunes against. One
    * map-combinable aggregate over the laid-out data.
    */
  def bucketEnvelopes(
      laidOut: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    laidOut.groupBy(col("z_bucket")).agg(aggs.head, aggs.tail: _*)
  }
}
