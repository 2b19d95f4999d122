package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // dim=4, m=2 subspaces of dsub=2, ksub=2 centroids each — small
  // enough to verify every code and ADC entry by hand.
  private val model = PqIndex.Model(IndexedSeq(
    IndexedSeq(IndexedSeq(1.0, 0.0), IndexedSeq(0.0, 1.0)),   // sub 0
    IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))))  // sub 1

  private val docs = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),  // codes (0, 0): exact centroid combo
    (1L, Seq(0.0, 1.0, 1.0, 1.0)),  // codes (1, 1): exact centroid combo
    (2L, Seq(0.9, 0.1, 0.1, 0.0)),  // codes (0, 0)
    (3L, Seq(0.1, 0.9, 0.9, 1.0))   // codes (1, 1)
  ).toDF("vec_id", "vec")

  test("encodeCol: argmin per subspace, hand-checked codes") {
    val got = docs.withColumn("codes", model.encodeCol(col("vec"), roundScale = 4))
      .orderBy("vec_id").select("codes").as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(0, 0), Seq(1, 1), Seq(0, 0), Seq(1, 1)))
  }

  test("encodeCol ties break to the lowest code") {
    val mid = Seq((9L, Seq(0.5, 0.5, 0.5, 0.5))).toDF("vec_id", "vec")
    val got = mid.withColumn("codes", model.encodeCol(col("vec"), roundScale = 4))
      .select("codes").as[Seq[Int]].head
    assert(got == Seq(0, 0)) // equidistant in both subspaces
  }

  test("fused encodeCol == HOF encodeColSql on random vectors (rounded and raw)") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "vec")
    for (rs <- Seq(-1, 4)) {
      val fused = vecs.withColumn("c", model.encodeCol(col("vec"), rs))
        .orderBy("vec_id").select("c").as[Seq[Int]].collect().toSeq
      val hof = vecs.withColumn("c", model.encodeColSql(col("vec"), rs))
        .orderBy("vec_id").select("c").as[Seq[Int]].collect().toSeq
      assert(fused == hof, s"mismatch at roundScale=$rs")
    }
  }

  test("adcTable and adcMicrosCol: exact for vectors that ARE centroid combos") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    // table(0) = (0, 2) * 1e4; table(1) = (0, 2) * 1e4
    assert(model.adcTable(q, 4) == IndexedSeq(IndexedSeq(0L, 20000L), IndexedSeq(0L, 20000L)))
    val adc = docs.withColumn("codes", model.encodeCol(col("vec"), 4))
      .withColumn("adc", model.adcMicrosCol(col("codes"), q, 4))
      .orderBy("vec_id").select("adc").as[Long].collect().toSeq
    // doc0 reconstructs exactly to q -> 0; doc1 reconstructs to (0,1,1,1) -> 2+2
    assert(adc == Seq(0L, 40000L, 0L, 40000L))
  }

  test("search: ADC candidates + exact rerank returns k rows, exact when candidates cover all") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val exact = VectorIndex.topK(docs, "vec", q, 3, "cosine",
      tieBreak = Seq("vec_id"), roundScale = 4).select("vec_id").as[Long].collect().toSeq
    val full = PqIndex.search(docs, "vec", model, q, k = 3, candidates = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    val tight = PqIndex.search(docs, "vec", model, q, k = 2, candidates = 2).collect()
    assert(tight.length == 2)
  }

  test("search: caller columns named pq_codes/adc_micros survive (collision-proof internals)") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val withClash = docs
      .withColumn("pq_codes", org.apache.spark.sql.functions.lit("mine"))
      .withColumn("adc_micros", org.apache.spark.sql.functions.lit(-1L))
    val out = PqIndex.search(withClash, "vec", model, q, k = 3, candidates = 10)
    // the caller's columns are untouched, not overwritten or dropped
    assert(out.columns.count(_ == "pq_codes") == 1)
    assert(out.select("pq_codes").as[String].collect().forall(_ == "mine"))
    assert(out.select("adc_micros").as[Long].collect().forall(_ == -1L))
    // and the ranking itself is unchanged by the clash
    val clean = PqIndex.search(docs, "vec", model, q, k = 3, candidates = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(out.select("vec_id").as[Long].collect().toSeq == clean)
  }

  test("fit: rectangular codebooks, valid codes, near-zero quantization error on separated clusters") {
    // Two tight clusters per subspace -> k-means recovers them, and the
    // reconstruction error of every point is far below the
    // cross-cluster distance.
    val rows = (0 until 40).map { i =>
      val a = if (i % 2 == 0) 0.0 else 1.0
      val b = if (i % 3 == 0) 0.0 else 1.0
      val eps = (i % 5) * 0.01
      (i.toLong, Seq(a + eps, a, b, b + eps))
    }
    val df = rows.toDF("vec_id", "vec")
    val m = PqIndex.fit(df, "vec", m = 2, ksub = 2, seed = 7)
    assert(m.m == 2 && m.ksub == 2 && m.dsub == 2)
    val codes = df.withColumn("codes", m.encodeCol(col("vec")))
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 2)))
    // both codes used somewhere (clusters actually separated)
    assert(codes.map(_.head).distinct.sorted.toSeq == Seq(0, 1))
    assert(codes.map(_(1)).distinct.sorted.toSeq == Seq(0, 1))
  }

  test("searchIvf: probing every cluster with full candidates reduces to exact topK") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val ivf = IvfIndex.Model(IndexedSeq(
      IndexedSeq(1.0, 0.0, 0.0, 0.0), IndexedSeq(0.0, 1.0, 1.0, 1.0)))
    val exact = VectorIndex.topK(docs, "vec", q, 3, "cosine",
      tieBreak = Seq("vec_id"), roundScale = 4).select("vec_id").as[Long].collect().toSeq
    val full = PqIndex.searchIvf(docs, "vec", ivf, model, q, k = 3,
        candidates = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    // nprobe=1 prunes to the query's own cluster: docs 0 and 2 only
    val pruned = PqIndex.searchIvf(docs, "vec", ivf, model, q, k = 3,
        candidates = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(pruned == Seq(0L, 2L))
  }

  test("encodeCol fails fast on an OVERLONG vector instead of prefix-encoding it") {
    // A 5-dim vector in the 4-dim model: every subspace slice still
    // "fits" (avail >= dsub in both), so only the whole-vector length
    // check can reject it — silent prefix codes would corrupt ADC
    // ranking with no error.
    val overlong = Seq((7L, Seq(1.0, 0.0, 0.0, 0.0, 9.9))).toDF("vec_id", "vec")
    val e = intercept[Exception] {
      overlong.withColumn("codes", model.encodeCol(col("vec"), roundScale = 4))
        .collect()
    }
    // task failures arrive wrapped — search the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("exactly 4"), msgs)
  }

  test("model validation rejects ragged codebooks") {
    intercept[IllegalArgumentException] {
      PqIndex.Model(IndexedSeq(
        IndexedSeq(IndexedSeq(1.0, 0.0)),
        IndexedSeq(IndexedSeq(1.0, 0.0), IndexedSeq(0.0, 1.0))))
    }
    intercept[IllegalArgumentException] {
      PqIndex.Model(IndexedSeq(IndexedSeq(IndexedSeq(1.0), IndexedSeq(0.0, 1.0))))
    }
  }

  // ---- OPQ: rotations -------------------------------------------------

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("HouseholderRotation: engine rotateCol == driver applyVec bitwise; orthonormal") {
    val u = IndexedSeq(0.3, -1.2, 0.7, 2.1)
    val rot = PqIndex.HouseholderRotation(u)
    val vecs = randVecs(100, 4, 11)
    val df = vecs.toDF("vec_id", "vec")
    val engine = df.withColumn("r", rot.rotateCol(col("vec")))
      .orderBy("vec_id").select("r").as[Seq[Double]].collect().toSeq
    val driver = vecs.map { case (_, v) => rot.applyVec(v).toSeq }
    assert(engine == driver)
    // R is orthonormal: |R v| == |v| for all v (reflection preserves norms).
    vecs.foreach { case (_, v) =>
      val rv = rot.applyVec(v, roundScale = -1)
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val n1 = math.sqrt(rv.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"norm changed: $n0 -> $n1")
    }
  }

  test("MatrixRotation: engine rotateCol == driver applyVec bitwise") {
    // Any square matrix exercises the arithmetic parity (orthonormality
    // is a property of the FIT, pinned separately below).
    val rot = PqIndex.MatrixRotation(IndexedSeq(
      IndexedSeq(0.5, -0.5, 0.5, 0.5),
      IndexedSeq(0.5, 0.5, -0.5, 0.5),
      IndexedSeq(0.5, 0.5, 0.5, -0.5),
      IndexedSeq(-0.5, 0.5, 0.5, 0.5)))
    val vecs = randVecs(100, 4, 13)
    val df = vecs.toDF("vec_id", "vec")
    val engine = df.withColumn("r", rot.rotateCol(col("vec")))
      .orderBy("vec_id").select("r").as[Seq[Double]].collect().toSeq
    val driver = vecs.map { case (_, v) => rot.applyVec(v).toSeq }
    assert(engine == driver)
  }

  test("fitRotation: orthonormal rows (R Rt == I) and all dims covered") {
    val df = randVecs(400, 8, 17).toDF("vec_id", "vec")
    val rot = PqIndex.fitRotation(df, "vec", m = 2)
    assert(rot.dim == 8)
    for (i <- 0 until 8; j <- 0 until 8) {
      val dot = (0 until 8).map(t => rot.rows(i)(t) * rot.rows(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"R Rt [$i][$j] = $dot")
    }
  }

  test("OPQ beats plain PQ recall when variance concentrates in one subspace") {
    // Adversarial-for-PQ corpus: TWO independent signal directions
    // both live in the FIRST subspace (dims 0-1 at m=4, dsub=2), the
    // rest is tiny noise. Plain PQ must cover a genuine 2-D grid with
    // subspace 0's ksub centroids while subspaces 1-3 spend all their
    // bits on noise; the PCA rotation deals the two signal directions
    // into DIFFERENT subspaces, so each gets ksub centroids along ~one
    // dimension — the textbook OPQ win (Ge et al. §1, fig. 1).
    val rnd = new scala.util.Random(23)
    def vec(): Seq[Double] = {
      val a = rnd.nextDouble() * 4 - 2
      val b = rnd.nextDouble() * 4 - 2
      Seq(a, b,
        rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01,
        rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01,
        rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01)
    }
    val corpus = (0 until 1500).map(i => (i.toLong, vec()))
    val df = corpus.toDF("vec_id", "vec").cache()
    val queries = corpus.take(15)
    val k = 10
    val m = 4; val ksub = 8
    val pq = PqIndex.fit(df, "vec", m, ksub, seed = 5L)
    val (rot, opq) = PqIndex.fitRotated(df, "vec", m, ksub, seed = 5L)

    def recall(search: Seq[Double] => org.apache.spark.sql.DataFrame): Double = {
      val hits = queries.map { case (qid, qv) =>
        val exact = VectorIndex.topK(df, "vec", qv, k, "l2",
          scoreCol = "score", tieBreak = Seq("vec_id"), roundScale = 6)
          .select("vec_id").as[Long].collect().toSet
        val approx = search(qv).select("vec_id").as[Long].collect().toSet
        (exact intersect approx).size.toDouble / k
      }
      hits.sum / hits.size
    }
    // candidates == k: NO exact-rerank slack, the codes must rank well
    // on their own for the difference to show.
    val rPq = recall(qv => PqIndex.search(df, "vec", pq, qv, k,
      candidates = k, metric = "l2", roundScale = 6))
    val rOpq = recall(qv => PqIndex.searchRotated(df, "vec", rot, opq, qv, k,
      candidates = k, metric = "l2", roundScale = 6))
    df.unpersist()
    assert(rOpq > rPq + 0.05,
      f"OPQ recall $rOpq%.3f not better than PQ $rPq%.3f")
  }

  test("rotations propagate NULL and dim mismatch as NULL, never zero-codes") {
    // transform maps over the ROWS literal, so a null vector used to
    // come out of MatrixRotation.rotateCol as a non-null array of d
    // nulls — which passed the encode kernel's length gate and unboxed
    // to 0.0 per component: every null-vec doc got real zero-vector
    // codes and consumed candidate budget. Householder null-padded
    // SHORT vectors past the gate the same way via zip_with.
    val mrot = PqIndex.MatrixRotation(IndexedSeq(
      IndexedSeq(0.5, -0.5, 0.5, 0.5),
      IndexedSeq(0.5, 0.5, -0.5, 0.5),
      IndexedSeq(0.5, 0.5, 0.5, -0.5),
      IndexedSeq(-0.5, 0.5, 0.5, 0.5)))
    val hrot = PqIndex.HouseholderRotation(IndexedSeq(0.3, -1.2, 0.7, 2.1))
    val dirty = Seq(
      (0L, Some(Seq(1.0, 0.0, 0.0, 0.0))), // valid
      (1L, None),                          // null vec
      (2L, Some(Seq(1.0, 0.0))),           // short
      (3L, Some(Seq(1.0, 0.0, 0.0, 0.0, 9.0))) // long
    ).toDF("vec_id", "vec")
    for (rot <- Seq[PqIndex.Rotation](mrot, hrot)) {
      val got = dirty.withColumn("r", rot.rotateCol(col("vec")))
        .orderBy("vec_id").select("r").as[Option[Seq[Double]]].collect().toSeq
      assert(got(0).nonEmpty, s"$rot: valid row must rotate")
      assert(got.drop(1).forall(_.isEmpty),
        s"$rot: null/mismatched rows must be NULL, got ${got.drop(1)}")
      // and through encode + ADC: null ADC (codes carry null ELEMENTS —
      // the array itself is non-null by construction), AND the
      // null-screen filter must actually survive optimization —
      // element_at over the literal ADC table reports nullable=false,
      // so before adcMicrosCol's explicit when-guard Catalyst PRUNED
      // the `adc IS NOT NULL` filter in every consumer.
      val adc = dirty
        .withColumn("c", model.encodeCol(rot.rotateCol(col("vec")), 4))
        .withColumn("a", model.adcMicrosCol(col("c"), Seq(1.0, 0.0, 0.0, 0.0), 4))
      val vals = adc.orderBy("vec_id").select("a").as[Option[Long]].collect().toSeq
      assert(vals(0).nonEmpty && vals.drop(1).forall(_.isEmpty), s"$rot: $vals")
      val kept = adc.where(col("a").isNotNull).select("vec_id").as[Long].collect().toSeq
      assert(kept == Seq(0L), s"$rot: IS NOT NULL filter was optimized away: $kept")
    }
  }

  test("search: null-vec rows never consume the candidate budget") {
    // Null ADC sorts FIRST under ASC; pre-screen, `candidates` null-vec
    // rows starved every real doc out of the rerank.
    val withNulls = docs.unionByName(
      (10L until 20L).map(i => (i, null.asInstanceOf[Seq[Double]]))
        .toDF("vec_id", "vec"))
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val got = PqIndex.search(withNulls, "vec", model, q, k = 2, candidates = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(0L, 2L), s"expected the two nearest real docs, got $got")
    val rgot = PqIndex.searchRotated(withNulls, "vec",
        PqIndex.HouseholderRotation(IndexedSeq(0.3, -1.2, 0.7, 2.1)),
        model, q, k = 2, candidates = 4)
      .select("vec_id").as[Long].collect()
    assert(rgot.length == 2 && !rgot.exists(_ >= 10L))
  }

  test("searchRotated refuses an input that already has __rvec") {
    val df = randVecs(5, 4, 3).toDF("vec_id", "vec")
      .withColumn("__rvec", col("vec"))
    val rot = PqIndex.HouseholderRotation(IndexedSeq(1.0, 0.0, 0.0, 0.0))
    val e = intercept[IllegalArgumentException] {
      PqIndex.searchRotated(df, "vec", rot, model, Seq(1.0, 0.0, 0.0, 0.0),
        k = 2, candidates = 4)
    }
    assert(e.getMessage.contains("__rvec"))
  }
}
