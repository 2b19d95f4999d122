package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.IvfIndex

/** SemDeDup: within-cluster semantic dedup with the min-id survivor
  * rule; cross-cluster pairs are by design never examined. */
class SemDedupSpec extends SparkSpec {

  // Two well-separated clusters around e1 and e2 in R^4.
  private val model = IvfIndex.Model(IndexedSeq(
    IndexedSeq(1.0, 0.0, 0.0, 0.0),
    IndexedSeq(0.0, 1.0, 0.0, 0.0)))

  private def df = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0, 0.01, 0.0, 0.0)),   // cluster 0
      (1L, Array(0.99, 0.0, 0.01, 0.0)),  // cluster 0, dup of 0
      (2L, Array(0.9, 0.0, 0.0, 0.44)),   // cluster 0, distinct enough
      (3L, Array(0.0, 1.0, 0.02, 0.0)),   // cluster 1
      (4L, Array(0.01, 0.98, 0.0, 0.0)),  // cluster 1, dup of 3
      (5L, Array(0.02, 0.97, 0.01, 0.0))  // cluster 1, dup of 3 AND 4
    ).toDF("id", "vec")
  }

  test("pairs: only within-cluster, id_a < id_b, cosine thresholded") {
    val p = SemDedup.pairs(df, "id", "vec", model, threshold = 0.995)
      .orderBy("id_a", "id_b").collect()
    assert(p.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 1L), (3L, 4L), (3L, 5L), (4L, 5L)))
    assert(p.forall(r => r.getDouble(3) >= 0.995))
    // ids 0..2 are cluster 0, ids 3..5 cluster 1 — no cross pairs.
    assert(p.forall(r => (r.getLong(1) < 3) == (r.getLong(2) < 3)))
  }

  test("flag: min-id survivor, dup_of null for kept rows") {
    val f = SemDedup.flag(df, "id", "vec", model, threshold = 0.995)
      .orderBy("id").collect()
    val dupOf = f.map(r => if (r.isNullAt(3)) None else Some(r.getLong(3)))
    assert(dupOf.toSeq === Seq(None, Some(0L), None, None, Some(3L), Some(3L)))
    assert(f.map(_.getInt(2)).toSeq === Seq(0, 1, 0, 0, 1, 1))
    assert(f.map(_.getInt(1)).toSeq === Seq(0, 0, 0, 1, 1, 1))
  }

  test("cluster pruning is real: a cross-cluster near-dup is not flagged") {
    import spark.implicits._
    // Diagonal vector: cosine ~0.999 with its twin, but the twin lands
    // in the OTHER cluster — SemDeDup's documented recall miss.
    val tricky = Seq(
      (0L, Array(1.0, 0.9, 0.0, 0.0)),  // nearer e1 -> cluster 0
      (1L, Array(0.9, 1.0, 0.0, 0.0))   // nearer e2 -> cluster 1
    ).toDF("id", "vec")
    assert(SemDedup.pairs(tricky, "id", "vec", model, 0.9).count() === 0L)
    val f = SemDedup.flag(tricky, "id", "vec", model, 0.9).collect()
    assert(f.forall(_.getInt(2) == 0))
  }

  test("multi-probe membership closes the cross-cluster miss (nProbes = 2)") {
    import spark.implicits._
    val tricky = Seq(
      (0L, Array(1.0, 0.9, 0.0, 0.0)),  // nearer e1 -> cluster 0
      (1L, Array(0.9, 1.0, 0.0, 0.0))   // nearer e2 -> cluster 1
    ).toDF("id", "vec")
    // single-probe misses it (the pinned behavior above); 2 probes
    // give both members the probe set {0, 1}, so they meet
    val p2 = SemDedup.pairs(tricky, "id", "vec", model, 0.9, nProbes = 2)
      .collect()
    assert(p2.length == 1, p2.mkString(";"))
    assert((p2(0).getInt(0), p2(0).getLong(1), p2(0).getLong(2)) == ((0, 0L, 1L)),
      p2(0).toString)  // deduped to the SMALLEST shared cluster, once
    // both screen paths agree
    val p2ref = SemDedup.pairs(tricky, "id", "vec", model, 0.9,
      int8Screen = false, nProbes = 2).collect()
    assert(p2ref.length == 1 &&
      (p2ref(0).getLong(1), p2ref(0).getLong(2)) == ((0L, 1L)))
    // flag: dup flagged, identity columns still from the PRIMARY cell
    val f2 = SemDedup.flag(tricky, "id", "vec", model, 0.9, nProbes = 2)
      .orderBy("id").collect()
    assert(f2.length == 2)
    assert(f2.map(_.getInt(1)).toSeq == Seq(0, 1), "primary clusters kept")
    assert(f2(0).getInt(2) == 0 && f2(1).getInt(2) == 1 && f2(1).getLong(3) == 0L)
    // on the well-separated corpus multi-probe adds NOTHING (cosines
    // across clusters sit far below the threshold): byte-identical
    val base = SemDedup.pairs(df, "id", "vec", model, 0.995)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val multi = SemDedup.pairs(df, "id", "vec", model, 0.995, nProbes = 2)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(multi == base)
  }

  test("filtering on the flag yields a deterministic survivor corpus") {
    val kept = SemDedup.flag(df, "id", "vec", model, threshold = 0.995)
      .where(col("is_dup") === 0).select("id").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(0L, 2L, 3L))
  }

  test("int8 screen is lossless: screened pairs == exact pairs on a boundary-heavy corpus") {
    import spark.implicits._
    // Deterministic pseudo-random vectors with MANY pairs straddling
    // the threshold: cosines concentrate near cos(angle between
    // same-cluster members), and the 0.97 threshold cuts through the
    // populated band. The screen may only ever ADD candidates to the
    // rerank, never lose one — so the two paths must match exactly.
    def vec(i: Int): Array[Double] = {
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.0, 0.0)
                 else Array(0.0, 1.0, 0.0, 0.0)
      val r1 = ((i * 2654435761L) % 1000).toDouble / 4000.0
      val r2 = ((i * 40503L) % 1000).toDouble / 4000.0
      Array(base(0) + r1 * 0.3, base(1) + r2 * 0.3, r1, r2)
    }
    val many = (0 until 120).map(i => (i.toLong, vec(i))).toDF("id", "vec")
    for (t <- Seq(0.9, 0.97, 0.995)) {
      val exact = SemDedup.pairs(many, "id", "vec", model, t,
          int8Screen = false)
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      val screened = SemDedup.pairs(many, "id", "vec", model, t)
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(screened === exact, s"threshold=$t")
      assert(exact.nonEmpty, s"threshold=$t must exercise real pairs")
    }
  }

  test("zero vectors survive the screen path identically (NaN bound kept)") {
    import spark.implicits._
    val withZero = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 0.0, 0.0, 0.0)),  // zero vector: NaN cosine
      (2L, Array(0.99, 0.01, 0.0, 0.0))
    ).toDF("id", "vec")
    val exact = SemDedup.flag(withZero, "id", "vec", model, 0.99,
        int8Screen = false)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val screened = SemDedup.flag(withZero, "id", "vec", model, 0.99)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(screened === exact)
  }

  test("a non-castable id raises instead of silently never pairing") {
    import spark.implicits._
    val bad = Seq(("x1", Array(1.0, 0.0, 0.0, 0.0)),
      ("7", Array(0.99, 0.0, 0.0, 0.0))).toDF("id", "vec")
    val ex = intercept[Throwable] {
      SemDedup.flag(bad, "id", "vec", model, 0.9).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("not castable"), s"unexpected failure: $msgs")
  }
}
