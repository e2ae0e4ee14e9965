package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit i of dim d at position i*n + d (closed form)") {
    // p = 0b101 -> positions 0,2,4 ; s = 0b011 -> positions 1,3,5
    // z = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val row = Seq((5L, 3L)).toDF("p", "s")
      .select(Layout.interleave(Seq(col("p"), col("s")), 3).as("z"))
      .head()
    assert(row.getLong(0) === 27L)
    // one dim degenerates to the identity
    val id = Seq(Tuple1(41L)).toDF("p")
      .select(Layout.interleave(Seq(col("p")), 6).as("z")).head()
    assert(id.getLong(0) === 41L)
  }

  test("shiftFor is the smallest shift fitting the span under 2^bits") {
    assert(Layout.shiftFor(100L, 8) === 0)
    assert(Layout.shiftFor(256L, 8) === 0) // 255 >> 0 = 255 < 256
    assert(Layout.shiftFor(257L, 8) === 1)
    assert(Layout.shiftFor(2000L, 8) === 3)
    assert(Layout.shiftFor(1L, 8) === 0)
  }

  test("quantized values always land in [0, 2^bits)") {
    val df = Seq(-500L, -1L, 0L, 123L, 99999L).toDF("x")
    val plan = Layout.quantizationPlan(df, Seq("x"), 8)
    val mm = df.select(plan.head.quantized.as("q"))
      .agg(min(col("q")), max(col("q"))).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 255L)
  }

  test("a box on the SECOND dim prunes z-buckets; a first-dim sort cannot prune it") {
    // uniform 64x64 grid: every (x, y) once
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val plan = Layout.quantizationPlan(grid, Seq("x", "y"), 6)
    val z = Layout.withZ(grid, plan, bits = 6, bucketBits = 4)
    val env = Layout.bucketEnvelopes(z, Seq("x", "y")).collect()
    assert(env.length === 16, "4 prefix bits over a full grid -> 16 buckets")
    // box: y in [0, 15], x unconstrained (1/4 of the y range)
    val zScan = env.count(r =>
      !(r.getAs[Long]("max_y") < 0L || r.getAs[Long]("min_y") > 15L))
    // the z prefix (4 bits = 2 x-bits + 2 y-bits interleaved) quarters the
    // y range: exactly 1/4 of the buckets can intersect the box
    assert(zScan === 4, s"z layout should scan 4/16 buckets, scanned $zScan")
    // the same data laid out by x alone (prefix buckets of x): every
    // bucket spans all of y, so the y box prunes NOTHING
    val xSorted = grid.withColumn("z_bucket", shiftright(col("x"), 2))
    val xEnv = Layout.bucketEnvelopes(xSorted, Seq("x", "y")).collect()
    val xScan = xEnv.count(r =>
      !(r.getAs[Long]("max_y") < 0L || r.getAs[Long]("min_y") > 15L))
    assert(xScan === xEnv.length, "x-sorted layout cannot prune a y-only box")
  }

  test("bucketsForBox admits every bucket holding box rows and prunes the rest") {
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val plan = Layout.quantizationPlan(grid, Seq("x", "y"), 6)
    val boxes = Seq(
      Seq((0L, 63L), (0L, 15L)),   // y-band: 4/16 buckets
      Seq((0L, 15L), (0L, 63L)),   // x-band
      Seq((16L, 47L), (16L, 47L)), // center box crossing bucket borders
      Seq((5L, 5L), (7L, 7L)))     // point box
    boxes.foreach { box =>
      val admitted = Layout.bucketsForBox(plan, bits = 6, bucketBits = 4, box).toSet
      // SOUND: every bucket that actually holds a box row is admitted
      val holding = Layout.withZ(
          grid.filter(col("x").between(box(0)._1, box(0)._2) &&
            col("y").between(box(1)._1, box(1)._2)),
          plan, bits = 6, bucketBits = 4)
        .select(col("z_bucket")).distinct().collect().map(_.getLong(0)).toSet
      assert(holding.subsetOf(admitted), s"box $box missed buckets ${holding -- admitted}")
      // TIGHT here: on a full grid every admitted bucket intersects the box
      assert(admitted === holding, s"box $box over-admitted ${admitted -- holding}")
    }
    // the flagship ratio: a second-dim band scans 4 of 16 buckets
    assert(Layout.bucketsForBox(plan, 6, 4, Seq((0L, 63L), (0L, 15L))).size === 4)
  }

  test("readBox equals the plain filter and partition-prunes the scan") {
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder_read").toString
    try {
      val plan = Layout.zorderWrite(grid, Seq("x", "y"), out, bits = 5, bucketBits = 4)
      val box = Seq((3L, 12L), (20L, 27L))
      val got = Layout.readBox(spark, out, plan, bits = 5, bucketBits = 4, box)
      val expected = grid.filter(
        col("x").between(3, 12) && col("y").between(20, 27))
      assert(got.count() === expected.count())
      assert(got.select(col("x"), col("y")).except(expected).count() === 0L)
      assert(expected.except(got.select(col("x"), col("y"))).count() === 0L)
      // the bucket set reaches the scan as a PARTITION filter
      got.collect()
      val scan = got.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("z_bucket"),
        s"bucket pruning did not reach the scan:\n$scan")
      val admitted = Layout.bucketsForBox(plan, 5, 4, box)
      assert(admitted.size < 16, "box should prune at least some buckets")
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }

  test("zorderWrite: one file per bucket dir, content preserved, envelopes nest") {
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      val plan = Layout.zorderWrite(grid, Seq("x", "y"), out, bits = 5, bucketBits = 2)
      assert(plan.map(_.shift) === Seq(0, 0))
      val back = spark.read.parquet(out)
      assert(back.count() === 32L * 32L)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("z_bucket="))
      assert(dirs.length === 4)
      dirs.foreach { d =>
        val files = d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(files.length === 1,
          s"bucket dir ${d.getName} should hold ONE file, has ${files.length}")
      }
      // each bucket's rows re-derive their own bucket id (layout is a pure
      // function of the row, so a reader can recompute membership)
      val rederived = Layout.withZ(back.drop("z_bucket"), plan, bits = 5, bucketBits = 2)
        .withColumnRenamed("z_bucket", "rb")
      val joined = back.select(col("x"), col("y"), col("z_bucket"))
        .join(rederived.select(col("x"), col("y"), col("rb")), Seq("x", "y"))
      assert(joined.filter(col("z_bucket") =!= col("rb")).count() === 0L)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }
}
