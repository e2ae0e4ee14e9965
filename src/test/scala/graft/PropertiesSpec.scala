package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Paging}
import graft.search.{Analyzer, Scoring}

/** Property-based invariants (SURVEY §5.2 #4) via ScalaCheck. Pure-Scala
  * properties run at full case counts; DataFrame properties run a reduced
  * number of rounds (each round is a Spark job).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  test("rolling hash equals the BigInt polynomial model over Z/2^64") {
    val two64 = BigInt(1) << 64
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.map(_.toByte).toArray
      val got = graft.functions.RollingHash.hashBytes(arr)
      val expected = arr.foldLeft(BigInt(0))((acc, b) =>
        (acc * 131 + (b & 0xff)).mod(two64))
      BigInt(got).mod(two64) == expected
    })
  }

  test("fuzziness AUTO: monotone in term length, bounded by 2") {
    check(Prop.forAll(Gen.chooseNum(0, 50), Gen.chooseNum(0, 50)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      Scoring.autoFuzz(lo) <= Scoring.autoFuzz(hi) &&
        Scoring.autoFuzz(hi) <= 2 && Scoring.autoFuzz(lo) >= 0
    })
  }

  test("analyzer keywords: lowercase and length-filtered") {
    val word = Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(Gen.listOf(word)) { words =>
      val kws = Analyzer.keywordsOf(words.mkString(" "))
      kws.forall(w => w.length >= 4 && w == w.toLowerCase)
    })
  }

  test("symmetric-delete guarantee: lev(a,b) <= d implies a shared <=d-deletion variant") {
    // the property the posting-table candidate pre-gate rests on
    // (graft.search.Posting): randomized over a small alphabet so edit
    // distances <= 2 actually occur
    import graft.functions.DeletionVariantsExpr.variantsOf
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val word = Gen.chooseNum(0, 7).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    check(Prop.forAll(word, word, Gen.chooseNum(0, 2)) { (a, b, d) =>
      lev(a, b) > d ||
        variantsOf(a, d).toSet.intersect(variantsOf(b, d).toSet).nonEmpty
    }, cases = 400)
  }

  test("deletion variant counts: distinct, contain the original, bounded by the closed form") {
    val word = Gen.chooseNum(0, 10).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(word) { w =>
      import graft.functions.DeletionVariantsExpr.variantsOf
      val vs = variantsOf(w, 2)
      val n = w.length
      vs.head == w && vs.distinct == vs &&
        vs.size <= 1 + n + n * math.max(0, n - 1) / 2 &&
        vs.forall(v => v.length >= n - 2)
    })
  }

  test("pagination partitions the top-N: pages disjoint, concatenation = prefix") {
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      size <- Gen.chooseNum(1, 7)
    } yield (n, size)
    check(Prop.forAllNoShrink(gen) { case (n, size) =>
      val df = (0 until n).map(i => (i.toLong, (i * 2654435761L) % 1000)).toDF("id", "v")
      val order = Seq(col("v").desc, col("id"))
      val pages = (1 to 3).map(p =>
        Paging.paginate(df, order, p, size).select("id").as[Long].collect().toSeq)
      val prefix = df.orderBy(order: _*).limit(3 * size).select("id").as[Long].collect().toSeq
      pages.flatten == prefix && pages.flatten.distinct.size == pages.flatten.size
    }, cases = 12)
  }

  test("deep pagination refused past the result window; boundary page served") {
    val df = (0 until 30).map(i => (i.toLong, (i * 7L) % 13)).toDF("id", "v")
    val order = Seq(col("v").desc, col("id"))
    // page*size == window is the last servable page
    assert(Paging.paginate(df, order, 5, 4, maxWindow = 20).count() == 4L)
    val e = intercept[IllegalArgumentException](
      Paging.paginate(df, order, 6, 4, maxWindow = 20))
    assert(e.getMessage.contains("result window"))
    // size clamps to maxSize BEFORE the window check (a huge requested
    // size on an early page is a clamp, not a refusal)
    assert(Paging.paginate(df, order, 2, 1000, maxSize = 5, maxWindow = 20)
      .count() == 5L)
    // the default window is the ES index.max_result_window analog
    assert(Paging.MaxResultWindow == 10000)
    val deep = intercept[IllegalArgumentException](
      Paging.paginate(df, order, 101, 100))
    assert(deep.getMessage.contains("10000"))
  }

  test("keyset pagination equals offset pagination page-for-page on a total order") {
    val df = (0 until 60).map(i => (i.toLong, (i * 2654435761L) % 40)).toDF("id", "v")
    val order = Seq(col("v").desc, col("id"))
    val sortCols = Seq(("v", false), ("id", true))
    var last: Option[Seq[Any]] = None
    (1 to 4).foreach { p =>
      val off = Paging.paginate(df, order, p, 7).select("id").as[Long].collect().toSeq
      val ks = Paging.searchAfter(df, sortCols, last, 7)
        .select(col("v"), col("id")).collect()
      assert(ks.map(_.getLong(1)).toSeq === off,
        s"page $p diverged between the offset and keyset routes")
      last = Some(Seq(ks.last.getLong(0), ks.last.getLong(1)))
    }
    // arity misuse is loud
    val e = intercept[IllegalArgumentException](
      Paging.searchAfter(df, sortCols, Some(Seq(1L)), 7))
    assert(e.getMessage.contains("sort columns"))
  }

  test("unpivot then pivot is the identity on wide numeric tables") {
    check(Prop.forAllNoShrink(Gen.chooseNum(1, 25)) { n =>
      val wide = (0 until n).map(i => (i.toLong, i * 1.5, i * -3.0)).toDF("id", "m1", "m2")
      val long = wide.unpivot(Array(col("id")), Array(col("m1"), col("m2")), "metric", "value")
      val back = long.groupBy("id").pivot("metric", Seq("m1", "m2")).agg(first("value"))
      back.select("id", "m1", "m2").exceptAll(wide).count() == 0L &&
        wide.exceptAll(back.select("id", "m1", "m2")).count() == 0L
    }, cases = 8)
  }

  test("minhash signatures are set-semantic: duplicate shingles don't change them") {
    check(Prop.forAllNoShrink(Gen.chooseNum(3, 12)) { n =>
      val words = (0 until n).map(i => s"w$i").mkString(" ")
      val docs = Seq((1L, words), (2L, words + " " + words)).toDF("doc_id", "text")
      // doc 2 repeats every shingle of doc 1 (plus the seam shingles) —
      // signatures may differ only via NEW seam shingles, so instead
      // compare doc 1 against itself with literally duplicated rows
      val sh1 = Dedup.wordShingles(docs.filter(col("doc_id") === 1L), "doc_id", "text")
      val dup = sh1.unionAll(sh1)
      val a = Dedup.minhashSignatures(sh1, "doc_id", k = 4).collect().head
      val b = Dedup.minhashSignatures(dup, "doc_id", k = 4).collect().head
      a.toSeq == b.toSeq
    }, cases = 6)
  }

  test("scoring monotonicity: adding matched terms never lowers multiMatch") {
    check(Prop.forAllNoShrink(Gen.chooseNum(1, 6), Gen.chooseNum(0, 3)) { (nBase, nExtra) =>
      val fieldWords = (0 until 8).map(i => s"tok$i")
      val field = fieldWords.mkString(" ")
      val base = fieldWords.take(nBase)
      val extra = base ++ fieldWords.slice(nBase, nBase + nExtra)
      val df = Seq(field).toDF("f")
      val s1 = df.select(Scoring.shouldMatchCount(col("f"), base)).head().getInt(0)
      val s2 = df.select(Scoring.shouldMatchCount(col("f"), extra)).head().getInt(0)
      s2 >= s1
    }, cases = 10)
  }

  test("asofJoin equals the brute-force latest-at-or-before on random timelines") {
    val eventGen = for {
      nL <- Gen.chooseNum(1, 12)
      nR <- Gen.chooseNum(0, 12)
      lts <- Gen.listOfN(nL, Gen.chooseNum(0L, 40L))
      rts <- Gen.listOfN(nR, Gen.chooseNum(0L, 40L))
      keys <- Gen.listOfN(nL + nR, Gen.chooseNum(1, 3))
    } yield (lts.zip(keys.take(nL)), rts.distinct.zip(keys.drop(nL)))
    check(Prop.forAllNoShrink(eventGen) { case (lefts, rights) =>
      // rights unique per (key, ts) — the operator's documented requirement
      val r = rights.distinctBy(x => (x._2, x._1))
      val lDf = lefts.zipWithIndex
        .map { case ((t, k), i) => (k.toLong, new java.sql.Timestamp(t * 1000L), i.toLong) }
        .toDF("k", "ts", "left_id")
      val rDf = r.zipWithIndex
        .map { case ((t, k), i) => (k.toLong, new java.sql.Timestamp(t * 1000L), 100L + i) }
        .toDF("k", "ts", "right_id")
      val got = graft.ops.Events.asofJoin(lDf, rDf, "k", "ts", Seq("right_id"))
        .collect()
        .map(row => row.getAs[Long]("left_id") ->
          (if (row.isNullAt(row.fieldIndex("right_id"))) None
           else Some(row.getAs[Long]("right_id"))))
        .toMap
      val expected = lefts.zipWithIndex.map { case ((t, k), i) =>
        val cands = r.zipWithIndex.filter { case ((rt, rk), _) => rk == k && rt <= t }
        i.toLong -> cands.sortBy(_._1._1).lastOption.map(c => 100L + c._2.toLong)
      }.toMap
      got == expected
    }, cases = 8)
  }

  test("rangeJoin equals the naive BETWEEN theta-join on random intervals") {
    val gen = for {
      nP <- Gen.chooseNum(1, 10)
      nI <- Gen.chooseNum(0, 6)
      pts <- Gen.listOfN(nP, Gen.chooseNum(0L, 100L))
      starts <- Gen.listOfN(nI, Gen.chooseNum(0L, 100L))
      lens <- Gen.listOfN(nI, Gen.chooseNum(0L, 30L))
      bucket <- Gen.oneOf(7L, 13L, 31L) // deliberately unaligned widths
    } yield (pts, starts.zip(lens), bucket)
    check(Prop.forAllNoShrink(gen) { case (pts, ivs, bucket) =>
      val pDf = pts.zipWithIndex
        .map { case (t, i) => (i.toLong, new java.sql.Timestamp(t * 1000L)) }
        .toDF("point_id", "ts")
      val iDf = ivs.zipWithIndex
        .map { case ((s, len), i) =>
          (100L + i, new java.sql.Timestamp(s * 1000L), new java.sql.Timestamp((s + len) * 1000L))
        }
        .toDF("interval_id", "w_start", "w_end")
      val got = graft.ops.Events.rangeJoin(pDf, iDf, "ts", "w_start", "w_end", bucket)
        .select(col("point_id"), col("interval_id"))
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val expected = (for {
        (t, pi) <- pts.zipWithIndex
        ((s, len), ii) <- ivs.zipWithIndex
        if t >= s && t <= s + len
      } yield (pi.toLong, 100L + ii)).toSet
      got == expected
    }, cases = 8)
  }

  test("rangeJoinStream run in batch mode equals the batch rangeJoin on random data") {
    // withWatermark is a no-op on batch frames, so the STREAMING operator
    // executes as a plain query — a structural equivalence check between
    // the two routes the q60/q69 gates pin against one oracle. Intervals
    // share one fixed length (the streaming form derives the end from
    // intervalSeconds; the batch form takes an end column).
    val gen = for {
      nP <- Gen.chooseNum(1, 10)
      nI <- Gen.chooseNum(0, 6)
      pts <- Gen.listOfN(nP, Gen.chooseNum(0L, 100L))
      starts <- Gen.listOfN(nI, Gen.chooseNum(0L, 100L))
      ivLen <- Gen.chooseNum(1L, 30L)
      bucket <- Gen.oneOf(7L, 13L, 31L)
    } yield (pts, starts, ivLen, bucket)
    check(Prop.forAllNoShrink(gen) { case (pts, starts, ivLen, bucket) =>
      val pDf = pts.zipWithIndex
        .map { case (t, i) => (i.toLong, new java.sql.Timestamp(t * 1000L)) }
        .toDF("point_id", "ts")
      val iDf = starts.zipWithIndex
        .map { case (s, i) =>
          (100L + i, new java.sql.Timestamp(s * 1000L),
            new java.sql.Timestamp((s + ivLen) * 1000L))
        }
        .toDF("interval_id", "w_start", "w_end")
      val viaBatch = graft.ops.Events
        .rangeJoin(pDf, iDf, "ts", "w_start", "w_end", bucket)
        .select(col("point_id"), col("interval_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaStreamOp = graft.streaming.EventStream
        .rangeJoinStream(pDf, iDf.drop("w_end"), "ts", "w_start", ivLen, bucket)
        .select(col("point_id"), col("interval_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      viaStreamOp == viaBatch
    }, cases = 8)
  }

  test("int8 quantization: codes in [0,255], round-trip error within half a step, idempotent on lattice") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6f, 1e6f)).map(_.toArray)
    check(Prop.forAllNoShrink(vecGen) { vec =>
      val data = new GenericArrayData(vec.map(_.toDouble))
      val codes = graft.functions.QuantKernel.quantize(data, isFloat = false)
      val err = graft.functions.QuantKernel.maxErr(data, isFloat = false)
      val mn = vec.map(_.toDouble).min
      val mx = vec.map(_.toDouble).max
      val inRange = (0 until codes.numElements()).forall { i =>
        val c = codes.getInt(i); c >= 0 && c <= 255
      }
      inRange && err <= (mx - mn) / 255.0 / 2.0 + 1e-9
    })
    // dequantize → requantize is a fixpoint (codes on the lattice)
    check(Prop.forAllNoShrink(vecGen) { vec =>
      val data = new GenericArrayData(vec.map(_.toDouble))
      val codes = graft.functions.QuantKernel.quantize(data, isFloat = false)
      val mn = vec.map(_.toDouble).min
      val mx = vec.map(_.toDouble).max
      val deq = new GenericArrayData(Array.tabulate(vec.length)(i =>
        mn + codes.getInt(i) * (mx - mn) / 255.0))
      val codes2 = graft.functions.QuantKernel.quantize(deq, isFloat = false)
      (0 until vec.length).forall(i => codes.getInt(i) == codes2.getInt(i))
    }, cases = 50)
  }

  test("bloom filter: randomized no-false-negatives through the serialize/probe round-trip") {
    // the structural guarantee q89's exactness rests on: any string
    // inserted via the aggregate builder probes true through the
    // serialized BloomMightContain payload
    val strGen = Gen.nonEmptyListOf(Gen.identifier).map(_.distinct)
    check(Prop.forAllNoShrink(strGen) { members =>
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(members.size.toLong, 8L), 0.1)
      members.foreach(m => bloom.putBinary(m.getBytes("UTF-8")))
      val bytes = graft.functions.BloomExprs.serialize(bloom)
      val back = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
      members.forall(m => back.mightContainBinary(m.getBytes("UTF-8")))
    }, cases = 50)
  }

  test("containment pairs equal the brute-force shingle-set model on random corpora") {
    // q111/q114's kernel against an independent Scala model: every
    // co-shingled pair appears exactly once with exact intersection and
    // per-direction ratios (and nothing else)
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    check(Prop.forAllNoShrink(Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, doc))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sh = graft.ops.Dedup.wordShingles(docs, "doc_id", "text", w = 3)
      val got = graft.ops.Dedup.containmentPairs(sh, "doc_id", minContainment = 1e-9)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          ((r.getAs[Long]("inter"), r.getAs[Double]("c_a"), r.getAs[Double]("c_b")))).toMap
      val sets = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").toSeq.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size if inter > 0
      } yield (a, b) -> ((inter.toLong,
        inter.toDouble / sets(a).size, inter.toDouble / sets(b).size))).toMap
      got == want
    }, cases = 12)
  }

  test("shard manifests conserve the corpus and global samples nest, for random parameters") {
    import graft.ops.Training
    val idsGen = Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5000L))).map(_.distinct)
    check(Prop.forAllNoShrink(idsGen, Gen.chooseNum(1, 32), Gen.chooseNum(1, 40),
        Gen.chooseNum(1, 40)) { (ids, nShards, s1, s2) =>
      val df = ids.map(i => (i, i % 97)).toDF("doc_id", "sz")
      val manifest = Training.shardManifest(df, "doc_id", "sz", nShards).collect()
      val shardsOk = manifest.forall { r =>
        val s = r.getAs[Long]("shard"); s >= 0 && s < nShards
      }
      val conserved = manifest.map(_.getAs[Long]("n_docs")).sum == ids.size
      val (n, m) = (math.min(s1, s2), math.max(s1, s2))
      def sample(k: Int) = Training.globalSample(df, "doc_id", k)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val sn = sample(n)
      val sm = sample(m)
      shardsOk && conserved &&
        sn.size == math.min(n, ids.size) && sm.size == math.min(m, ids.size) &&
        sn.subsetOf(sm)
    }, cases = 10)
  }

  test("funnel equals the driver-side stage-chain replay on random event sets") {
    val eventGen = for {
      user <- Gen.chooseNum(1L, 5L)
      minute <- Gen.chooseNum(0L, 30L)
      tpe <- Gen.oneOf("a", "b", "c")
    } yield (user, new java.sql.Timestamp(minute * 60000L), tpe)
    val stages = Seq("a", "b", "c")
    check(Prop.forAll(Gen.listOfN(40, eventGen)) { events =>
      events.isEmpty || {
        val got = graft.ops.Events.funnel(
          events.toDF("user_id", "ts", "event_type"), "user_id", "ts", "event_type", stages)
          .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
        val want = events.groupBy(_._1).map { case (u, es) =>
          var depth = 0
          var prev: Option[Long] = None
          var continue = true
          stages.foreach { st =>
            if (continue) {
              val cand = es.collect {
                case (_, ts, t) if t == st && prev.forall(ts.getTime > _) => ts.getTime
              }
              if (cand.isEmpty) continue = false
              else { prev = Some(cand.min); depth += 1 }
            }
          }
          u -> depth
        }
        got == want
      }
    }, cases = 8)
  }

  test("nearest-cell kernels equal the naive argmax/argmin model on random codebooks") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val dimGen = Gen.chooseNum(1, 8)
    val prop = Prop.forAll(dimGen, Gen.chooseNum(1, 6), Gen.chooseNum(0L, Long.MaxValue)) {
      (dim, k, seed) =>
        val rnd = new scala.util.Random(seed)
        val vec = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
        val cents = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
        val cells = Array.range(0, k)
        val va = ArrayData.toArrayData(vec)
        val centsF = cents.map(c => ArrayData.toArrayData(c): ArrayData)
        val centsD = cents.map(c => ArrayData.toArrayData(c.map(_.toDouble)): ArrayData)
        // naive models: max/min by (score, -index) over the same kernel scores
        val cos = cents.indices.map(i =>
          graft.functions.VectorKernel.cosine(va, true, centsF(i), true))
        val d2 = cents.indices.map(i =>
          graft.functions.VectorKernel.dist2(va, true, centsD(i), false))
        val wantCos = cos.indices.minBy(i => (-cos(i), i))
        val wantL2 = d2.indices.minBy(i => (d2(i), i))
        graft.functions.VectorKernel.nearestCell(va, true, cells, centsF) == wantCos &&
          graft.functions.VectorKernel.nearestCellL2(va, true, cells, centsD) == wantL2
    }
    check(prop)
  }

  test("dist2 kernel equals the BigDecimal-free scalar model and relates to dot/norms") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val prop = Prop.forAll(Gen.chooseNum(1, 16), Gen.chooseNum(0L, Long.MaxValue)) {
      (dim, seed) =>
        val rnd = new scala.util.Random(seed)
        val a = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
        val b = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
        val (aa, ba) = (ArrayData.toArrayData(a), ArrayData.toArrayData(b))
        val got = graft.functions.VectorKernel.dist2(aa, false, ba, false)
        // scalar left-to-right reference
        var acc = 0.0
        var i = 0
        while (i < dim) { val d = a(i) - b(i); acc += d * d; i += 1 }
        java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(acc) &&
          got >= 0.0
    }
    check(prop)
  }

  test("Z-order interleave is a bijection: deinterleaving recovers every dimension") {
    val dims = Gen.chooseNum(1, 3)
    val prop = Prop.forAll(dims.flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 255L)))) { qs =>
      val n = qs.size
      // drive the production Column through a 1-row frame
      val df = spark.range(1).select(
        graft.ops.Layout.interleave(qs.map(lit(_)), bits = 8).as("z"))
      val z = df.head().getLong(0)
      // scalar deinterleave: bit i of dim d sits at position i*n + d
      val back = (0 until n).map { d =>
        (0 until 8).foldLeft(0L)((acc, i) =>
          acc | (((z >> (i * n + d)) & 1L) << i))
      }
      back == qs
    }
    check(prop, cases = 12) // each case is a Spark job
  }

  test("word_chunks partitions the tokens: concatenation restores the canonical form") {
    val word = Gen.chooseNum(1, 8).flatMap(k => Gen.stringOfN(k, Gen.alphaLowerChar))
    val prop = Prop.forAll(
      Gen.chooseNum(1, 20).flatMap(k => Gen.listOfN(k, word)),
      Gen.chooseNum(1, 7)) { (words, w) =>
      val text = words.mkString(" ")
      val chunks = graft.functions.WordChunksExpr
        .chunks(org.apache.spark.unsafe.types.UTF8String.fromString(text), w)
      val back = (0 until chunks.numElements())
        .map(i => chunks.getUTF8String(i).toString).mkString(" ")
      back == text && chunks.numElements() == (words.size + w - 1) / w
    }
    check(prop)
  }

  test("bucketsForBox is sound on random grids: every in-box point's bucket is admitted") {
    import graft.ops.Layout
    val bits = 6
    val bucketBits = 4
    // pure-Scala replay of quantize + interleave + prefix (2 dims)
    def bucketOf(plan: Seq[Layout.DimSpec], x: Long, y: Long): Long = {
      val q = Seq((x - plan(0).min) >> plan(0).shift, (y - plan(1).min) >> plan(1).shift)
      var z = 0L
      for (i <- 0 until bits; d <- 0 until 2)
        z |= (((q(d) >> i) & 1L) << (i * 2 + d))
      z >> (bits * 2 - bucketBits)
    }
    val pt = for {
      x <- Gen.chooseNum(-500L, 500L); y <- Gen.chooseNum(-500L, 500L)
    } yield (x, y)
    val prop = Prop.forAllNoShrink(
      Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n, pt)), pt, pt) {
      (points, c1, c2) =>
        val xs = points.map(_._1); val ys = points.map(_._2)
        val plan = Seq(
          Layout.DimSpec("x", xs.min, Layout.shiftFor(xs.max - xs.min + 1, bits)),
          Layout.DimSpec("y", ys.min, Layout.shiftFor(ys.max - ys.min + 1, bits)))
        val box = Seq(
          (math.min(c1._1, c2._1), math.max(c1._1, c2._1)),
          (math.min(c1._2, c2._2), math.max(c1._2, c2._2)))
        val admitted = Layout.bucketsForBox(plan, bits, bucketBits, box).toSet
        points.forall { case (x, y) =>
          val inBox = x >= box(0)._1 && x <= box(0)._2 && y >= box(1)._1 && y <= box(1)._2
          !inBox || admitted.contains(bucketOf(plan, x, y))
        }
    }
    check(prop, cases = 200)
  }

  test("incrementalComponents equals from-scratch keepers on random graphs and splits") {
    val prop = Prop.forAllNoShrink(
      Gen.chooseNum(2, 14),
      Gen.listOf(for {
        a <- Gen.chooseNum(0L, 13L); b <- Gen.chooseNum(0L, 13L) if a != b
      } yield (math.min(a, b), math.max(a, b))),
      Gen.chooseNum(1L, 13L)) { (n, pairs0, split) =>
      val ids = (0L until n.toLong)
      val pairs = pairs0.distinct.filter(p => p._1 < n && p._2 < n)
      val isNew = (id: Long) => id >= split
      val corpus = ids.toDF("doc_id")
      val allPairs = pairs.toDF("id_a", "id_b")
      val oldPairs = pairs.filter(p => !isNew(p._1) && !isNew(p._2)).toDF("id_a", "id_b")
      val newPairs = pairs.filter(p => isNew(p._1) || isNew(p._2)).toDF("id_a", "id_b")
      val oldLabels = Dedup.keepers(
          corpus.filter(!($"doc_id" >= split)), "doc_id", oldPairs)
        .select($"doc_id", $"component")
      val inc = Dedup.incrementalComponents(
          oldLabels, corpus.filter($"doc_id" >= split), "doc_id", newPairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val batch = Dedup.keepers(corpus, "doc_id", allPairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      inc == batch
    }
    check(prop, cases = 8)
  }

  test("weightedSample is a subset of the positive-weight rows, exactly min(n, |rows|)") {
    val prop = Prop.forAll(
      Gen.chooseNum(0, 30), Gen.chooseNum(0, 12)) { (rows, n) =>
      val df = (1L to rows.toLong).map(i => (i, (i % 5).toDouble)) // ids 5,10,… weigh 0
        .toDF("id", "w")
      val positive = (1L to rows.toLong).filter(_ % 5 != 0).toSet
      val got = graft.ops.Training.weightedSample(df, "id", "w", n)
        .collect().map(_.getLong(0)).toSet
      got.subsetOf(positive) && got.size == math.min(n, positive.size)
    }
    check(prop, cases = 12)
  }

  test("resizeImage: dims obey the integer formula and solid colors round-trip, any size") {
    val prop = Prop.forAll(
      Gen.chooseNum(1, 48), Gen.chooseNum(1, 48), Gen.chooseNum(1, 32),
      Gen.chooseNum(0, 0xFFFFFF)) { (w, h, maxDim, rgb) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val got = graft.ops.Multimodal.resizeImage(
        Seq(graft.ops.Multimodal.MediaRow(1L, bos.toByteArray, "image/png")).toDS(),
        maxDim).collect().head
      val m = math.max(w, h)
      val (ew, eh) =
        if (m <= maxDim) (w, h)
        else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(got.payload))
      got.decoded && got.orig_w == w && got.orig_h == h &&
        got.width == ew && got.height == eh &&
        back.getWidth == ew && back.getHeight == eh &&
        (0 until eh).forall(y => (0 until ew).forall(x =>
          (back.getRGB(x, y) & 0xFFFFFF) == rgb))
    }
    check(prop, cases = 10)
  }

  test("resampleAudio: frame count obeys the integer formula and constant signals survive, any rates") {
    val rates = Gen.oneOf(4000, 8000, 11025, 16000, 44100)
    val prop = Prop.forAll(
      Gen.chooseNum(1, 256), rates, rates,
      Gen.chooseNum(Short.MinValue + 1, Short.MaxValue.toInt)) { (n, src, target, v0) =>
      val v = v0.toShort
      val fmt = new javax.sound.sampled.AudioFormat(src.toFloat, 16, 2, true, false)
      val pcm = new Array[Byte](n * 4)
      for (f <- 0 until n; c <- 0 until 2) {
        pcm((f * 2 + c) * 2) = (v & 0xFF).toByte
        pcm((f * 2 + c) * 2 + 1) = ((v >> 8) & 0xFF).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val got = graft.ops.Multimodal.resampleAudio(
        Seq(graft.ops.Multimodal.MediaRow(1L, bos.toByteArray, "audio/wav")).toDS(),
        target).collect().head
      val expFrames = n.toLong * target / src
      val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(got.payload))
      val outBytes = try ain.readAllBytes() finally ain.close()
      val samples = Array.tabulate(outBytes.length / 2)(i =>
        ((outBytes(2 * i) & 0xFF) | (outBytes(2 * i + 1) << 8)).toShort)
      got.decoded && got.orig_frames == n.toLong && got.frames == expFrames &&
        samples.length.toLong == expFrames && samples.forall(_ == v)
    }
    check(prop, cases = 10)
  }

  test("sampleGifFrames: fan-out is exactly ceil(n/stride), indices on the stride grid") {
    val prop = Prop.forAll(Gen.chooseNum(1, 6), Gen.chooseNum(1, 4)) { (n, stride) =>
      def solid(rgb: Int) = {
        val img = new java.awt.image.BufferedImage(
          4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
        img
      }
      val gif = graft.queries.TextOps.animatedGif(
        (0 until n).map(f => (solid((f * 40) << 16), 0, 0, "none")))
      val got = graft.ops.Multimodal.sampleGifFrames(
        Seq(graft.ops.Multimodal.MediaRow(1L, gif, "image/gif")).toDS(), stride)
        .collect().sortBy(_.frame_idx)
      got.length == (n + stride - 1) / stride &&
        got.forall(f => f.n_frames == n && f.frame_idx % stride == 0 && f.decoded)
    }
    check(prop, cases = 10)
  }

  test("theta helper algebra: commutative, associative, idempotent; exact set ops below k") {
    import graft.functions.SketchAggs
    // driver-built sketches via the SAME update path ThetaAgg uses
    // (Union.update(String)); aggregate-path equivalence is pinned in
    // SketchAggsSpec — here the algebra of the serving helpers
    def sk(s: Seq[String]): Array[Byte] = {
      val u = org.apache.datasketches.theta.SetOperation.builder()
        .setLogNominalEntries(12).buildUnion()
      s.foreach(w => u.update(w))
      u.getResult.toByteArray
    }
    val word = Gen.chooseNum(1, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(Gen.listOf(word), Gen.listOf(word)) { (xs, ys) =>
      val (a, b) = (sk(xs), sk(ys))
      val (sa, sb) = (xs.toSet, ys.toSet)
      val ab = SketchAggs.thetaUnion(a, b, 12)
      java.util.Arrays.equals(ab, SketchAggs.thetaUnion(b, a, 12)) &&
        java.util.Arrays.equals(SketchAggs.thetaUnion(ab, b, 12), ab) &&
        SketchAggs.thetaEstimate(ab) == (sa ++ sb).size.toDouble &&
        SketchAggs.thetaIntersectEstimate(a, b) == sa.intersect(sb).size.toDouble &&
        SketchAggs.thetaAnotBEstimate(a, b) == sa.diff(sb).size.toDouble
    }, cases = 60)
  }

  test("kll below k: quantiles are exact inclusive order statistics; merge adds weight") {
    import graft.functions.SketchAggs
    def sk(s: Seq[Double]): Array[Byte] = {
      val k = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
      s.foreach(k.update)
      k.toByteArray
    }
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000)), Gen.chooseNum(0, 100)) { (xs0, qi) =>
      val xs = xs0.take(150).map(_.toDouble) // n <= 150 < k: no compaction
      val q = qi / 100.0
      val sorted = xs.sorted
      val n = xs.size
      // inclusive semantics: smallest item whose normalized rank
      // (#items <= it)/n reaches q — the same double comparison the
      // sketch's sorted view performs
      val idx = sorted.indices.find(i => (i + 1).toDouble / n >= q).getOrElse(n - 1)
      val bytes = sk(xs)
      SketchAggs.kllQuantile(bytes, q) == sorted(idx) &&
        SketchAggs.kllN(bytes) == n.toLong &&
        SketchAggs.kllN(SketchAggs.kllMerge(bytes, sk(xs.map(_ + 5000.0)))) == 2L * n
    }, cases = 80)
  }
}
