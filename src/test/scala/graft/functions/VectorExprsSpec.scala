package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)
  private def randVec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2f - 1f)

  /** The interpreted HOF fold the native expressions replaced — kept here as
    * the bit-exactness reference (same shape as the DuckDB oracle twins).
    */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  test("dot_f is bit-identical to the left-to-right HOF fold") {
    val df = Seq.tabulate(64)(i => (randVec(64), randVec(64), i)).toDF("a", "b", "i")
    val rows = df.select(
      VectorExprs.dot_f($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_f fused pass is bit-identical to composed dot/norm folds") {
    val df = Seq.tabulate(32)(i => (randVec(64), randVec(64), i)).toDF("a", "b", "i")
    val composed = {
      val denom = sqrt(hofDot($"a", $"a")) * sqrt(hofDot($"b", $"b"))
      when(denom > 0, hofDot($"a", $"b") / denom).otherwise(lit(-1.0))
    }
    val rows = df.select(
      VectorExprs.cosine_f($"a", $"b").as("native"),
      composed.as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_f guards zero-norm vectors with -1, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorExprs.cosine_f($"a", $"b")).head().getDouble(0) === -1.0)
  }

  test("mismatched dimensions fail loudly instead of truncating") {
    // the HOF fold returned NULL (row silently dropped); a partial dot
    // would rank a malformed vector — erroring is the only honest behavior
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExprs.dot_f($"a", $"b")).collect()
    }
    assert(e.getMessage != null)
  }

  test("typed NULL nPlanes/seed is an analysis error, not an NPE") {
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hyperplane_sketch(array(1.0F), CAST(NULL AS INT), 42)").collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles('a b c', CAST(NULL AS INT))").collect()
    }
  }

  test("expressions work on array<double> and mixed element types") {
    val df = Seq((Array(1.0, 2.0, 2.0), Array(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val r = df.select(
      VectorExprs.dot_f($"a", $"b").as("d"),
      VectorExprs.cosine_f($"a", $"b").as("c")).head()
    assert(r.getDouble(0) === 4.0)
    assert(math.abs(r.getDouble(1) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("hyperplane_sketch matches the scalar kernel and is seed-stable") {
    val vecs = Seq.tabulate(16)(i => (i.toLong, randVec(64)))
    val got = vecs.toDF("id", "v")
      .select($"id", VectorExprs.hyperplane_sketch($"v", lit(8), lit(42L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      assert(got(id) === VectorKernel.sketch(arr, true, 8, 42L))
      assert(got(id) >= 0L && got(id) < (1L << 8))
    }
  }

  test("sketches of a vector and a tiny perturbation collide; opposite vectors don't") {
    val base = randVec(64)
    val near = base.map(v => v + 1e-5f)
    val opp = base.map(v => -v)
    val rows = Seq((base, near, opp)).toDF("base", "near", "opp")
      .select(
        VectorExprs.hyperplane_sketch($"base", lit(16), lit(7L)).as("b"),
        VectorExprs.hyperplane_sketch($"near", lit(16), lit(7L)).as("n"),
        VectorExprs.hyperplane_sketch($"opp", lit(16), lit(7L)).as("o"))
      .head()
    assert(rows.getLong(0) === rows.getLong(1))
    // every sign bit flips for -v (projections negate; proj==0 measure-zero)
    assert((rows.getLong(0) ^ rows.getLong(2)) === (1L << 16) - 1L)
  }

  test("SQL registry path works; analysis rejects bad types") {
    val got = spark.sql("SELECT dot_f(array(1.0F, 2.0F), array(3.0F, 4.0F))").head().getDouble(0)
    assert(got === 11.0)
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_f('x', array(1.0F))").collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hyperplane_sketch(array(1.0F), 99, 42)").collect()
    }
  }

  test("nearest_cell matches the max_by(cell, struct(d, -cell)) rule it replaced") {
    // the pre-r10 IVF assignment built per-centroid struct(d, -cell, cell)
    // literals and took array_max — replicate that plan form here as the
    // semantic reference and require exact agreement, ties included
    val centroids = Seq(
      (3, Array(1.0f, 0.0f, 0.0f)),
      (0, Array(0.0f, 1.0f, 0.0f)),
      (7, Array(0.0f, 1.0f, 0.0f)), // duplicate of cell 0: ties must pick 0
      (5, Array(0.0f, 0.0f, 1.0f)))
    val df = (Seq(
      Array(0.9f, 0.1f, 0.0f),
      Array(0.0f, 5.0f, 0.0f),   // exact tie between cells 0 and 7
      Array(0.0f, 0.0f, 0.0f),   // zero vector: every cosine is -1, tie → 0
      Array(-1.0f, -1.0f, 3.0f)) zip (0 until 4)).toDF("v", "i")
    val legacy = array_max(array(centroids.map { case (cell, c) =>
      struct(VectorExprs.cosine_f($"v", array(c.map(lit(_)).toSeq: _*)).as("d"),
        lit(-cell).as("nc"), lit(cell).as("cell"))
    }: _*)).getField("cell")
    val rows = df.select(
      VectorExprs.nearest_cell($"v",
        typedLit(centroids.map(_._1)), typedLit(centroids.map(_._2.toSeq))).as("native"),
      legacy.as("legacy"), $"i").collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1), s"row ${r.getInt(2)}"))
    assert(rows.map(_.getInt(0)).toSeq === Seq(3, 0, 0, 5))
  }

  test("nearest_cell handles a realistic (k=128, dim=256) codebook as one literal") {
    // 32k floats: the per-element-lit() plan this expression replaced would
    // carry 32k+ expression nodes here (ADVICE r10 hugeMethodLimit risk);
    // as a single reference object the plan is O(1) and must still agree
    // with a driver-side argmax over the same kernel
    val k = 128; val dim = 256
    val cents = Array.tabulate(k)(_ => randVec(dim))
    val cells = List.range(0, k)
    val vecs = Seq.tabulate(32)(i => (i, randVec(dim)))
    val got = vecs.toDF("i", "v")
      .select($"i", VectorExprs.nearest_cell($"v",
        typedLit(cells), typedLit(cents.map(_.toSeq).toSeq)).as("cell"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    import org.apache.spark.sql.catalyst.util.ArrayData
    vecs.foreach { case (i, v) =>
      val va = ArrayData.toArrayData(v)
      val want = cells.maxBy(c =>
        (VectorKernel.cosine(va, true, ArrayData.toArrayData(cents(c)), true), -c))
      assert(got(i) === want, s"vector $i")
    }
  }

  test("dist2_f is bit-identical to the left-to-right zip_with fold") {
    val df = Seq.tabulate(32)(i =>
      (randVec(64).map(_.toDouble), randVec(64).map(_.toDouble), i)).toDF("a", "b", "i")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)
    val rows = df.select(VectorExprs.dist2_f($"a", $"b").as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("nearest_cell_l2 matches the array_min(struct(d, c)) k-means rule it replaced") {
    val centroids = Seq(
      Array(1.0, 0.0),
      Array(0.0, 1.0),
      Array(0.0, 1.0),  // duplicate of index 1: ties must pick 1
      Array(-1.0, 0.0))
    val df = (Seq(
      Array(0.9, 0.1),
      Array(0.1, 0.9),   // exact tie between centroids 1 and 2
      Array(-2.0, 0.0)) zip (0 until 3)).toDF("v", "i")
    val legacy = array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(
          zip_with($"v", array(c.map(lit).toSeq: _*), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d).as("d"),
        lit(i).as("c"))
    }: _*)).getField("c")
    val rows = df.select(
      VectorExprs.nearest_cell_l2($"v",
        typedLit(centroids.indices.toList), typedLit(centroids.map(_.toSeq))).as("native"),
      legacy.as("legacy"), $"i").collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1), s"row ${r.getInt(2)}"))
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 3))
  }

  test("nearest_cell_l2 degenerate scores: NaN loses to finite, all-NaN ties to the lowest cell") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vecNaN = ArrayData.toArrayData(Array(Double.NaN, 1.0))
    val cells = Array(0, 1, 2)
    val cents = Array(
      ArrayData.toArrayData(Array(0.0, 0.0)): ArrayData,
      ArrayData.toArrayData(Array(1.0, 1.0)): ArrayData,
      ArrayData.toArrayData(Array(2.0, 2.0)): ArrayData)
    // every distance is NaN → legacy array_min(struct) ties to the LOWEST
    // cell; the pre-fix `<` loop returned Int.MaxValue (a nonexistent
    // cell — silent routing loss in a partitioned index)
    assert(VectorKernel.nearestCellL2(vecNaN, false, cells, cents) === 0)
    // a finite distance must beat NaN regardless of position
    val vecFin = ArrayData.toArrayData(Array(2.0, 2.0))
    assert(VectorKernel.nearestCellL2(vecFin, false, cells, cents) === 2)
  }

  test("null vector elements fail loudly in every kernel instead of scoring as zero") {
    val df = Seq(1).toDF("i").select(
      array(lit(1.0f), lit(null).cast("float")).as("a"),
      array(lit(1.0f), lit(2.0f)).as("b"))
    val e = intercept[Exception] {
      df.select(VectorExprs.dot_f($"a", $"b")).collect()
    }
    assert(e.getMessage != null)
    val e2 = intercept[Exception] {
      df.select(VectorExprs.nearest_cell_l2($"a",
        typedLit(Seq(0)), typedLit(Seq(Seq(1.0, 2.0))))).collect()
    }
    assert(e2.getMessage != null)
  }

  test("nearest_cell rejects a non-foldable or empty codebook at analysis") {
    val df = Seq((Array(1.0f), Array(0), Array(Array(1.0f)))).toDF("v", "cs", "ct")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExprs.nearest_cell($"v", $"cs", $"ct")).collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExprs.nearest_cell($"v",
        typedLit(Seq.empty[Int]), typedLit(Seq.empty[Seq[Float]]))).collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      // length mismatch between cells and centroids
      df.select(VectorExprs.nearest_cell($"v",
        typedLit(Seq(0, 1)), typedLit(Seq(Seq(1.0f))))).collect()
    }
  }

  test("nearest_cell / nearest_cell_l2 reject a null centroid ROW at analysis") {
    // a malformed codebook (null inner array) must fail the type check with
    // a clear message, not NPE lazily inside the kernel's cents init
    val df = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("v")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExprs.nearest_cell($"v",
        typedLit(Seq(0, 1)),
        typedLit(Seq(Seq(1.0f, 0.0f), null.asInstanceOf[Seq[Float]])))).collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExprs.nearest_cell_l2($"v",
        typedLit(Seq(0, 1)),
        typedLit(Seq(Seq(1.0, 0.0), null.asInstanceOf[Seq[Double]])))).collect()
    }
  }

  test("whole-stage codegen and interpreted eval agree") {
    val df = Seq.tabulate(64)(i => (randVec(64), randVec(64), i)).toDF("a", "b", "i")
    val codegen = df
      .select(VectorExprs.cosine_f($"a", $"b").as("c"), VectorExprs.dot_f($"a", $"b").as("d"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val interp = df.collect().map { r =>
      def ad(x: Seq[Float]) =
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(x.toArray)
      val (a, b) = (ad(r.getSeq[Float](0)), ad(r.getSeq[Float](1)))
      (VectorKernel.cosine(a, true, b, true), VectorKernel.dot(a, true, b, true))
    }.toSeq
    assert(codegen === interp)
  }
}
