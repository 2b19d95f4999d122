package graft.ops

import graft.SparkSpec

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  test("meanPool: exact micro sums and rounded means, hand-checked") {
    val df = Seq(
      (1L, Seq(0.5, -0.25)),
      (1L, Seq(0.1, 0.75)),
      (2L, Seq(1.0, 0.0))).toDF("id", "v")
    val got = Pooling.meanPool(df, "id", "v").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2), r.getSeq[Double](3))))
      .toMap
    assert(got(1L) == ((Seq(600000L, 500000L), 2L, Seq(0.3, 0.25))))
    assert(got(2L) == ((Seq(1000000L, 0L), 1L, Seq(1.0, 0.0))))
  }

  test("meanPool is partitioning-independent (merge-order-free fixed point)") {
    val rows = (0 until 1000).map(i =>
      ((i % 7).toLong, Seq(math.sin(i.toDouble), math.cos(i.toDouble), i / 1000.0)))
    val df = rows.toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Pooling.meanPool(d, "id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](3)))
        .sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(13)))
    assert(run(df) == run(df.coalesce(1)))
  }

  test("meanPool: ragged lengths widen with zero-fill; nulls are skipped") {
    val df = Seq(
      (1L, Some(Seq(1.0))),
      (1L, Some(Seq(1.0, 2.0))),
      (1L, None),
      (2L, None)).toDF("id", "v")
    val got = Pooling.meanPool(df, "id", "v").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getSeq[Long](1)), r.getLong(2)))
      .toMap
    assert(got(1L) == ((Seq(2000000L, 2000000L), 2L)))
    assert(got(2L) == ((null, 0L))) // all-null group -> null sum
  }

  test("maxPool: element-wise max, ragged tails absent not zero") {
    val df = Seq(
      (1L, Seq(0.5, -0.25)),
      (1L, Seq(0.1, -0.75)),
      (2L, Seq(-1.0))).toDF("id", "v")
    val got = Pooling.maxPool(df, "id", "v").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Double](3))))
      .toMap
    assert(got(1L) == ((Seq(500000L, -250000L), Seq(0.5, -0.25))))
    // single negative-element group: max is the value itself, NOT 0 —
    // ragged/absent dims never inject zeros into a max
    assert(got(2L) == ((Seq(-1000000L), Seq(-1.0))))
    val ragged = Seq((1L, Seq(-0.5)), (1L, Seq(-0.1, -0.2))).toDF("id", "v")
    val r = Pooling.maxPool(ragged, "id", "v").collect().head.getSeq[Long](1)
    assert(r == Seq(-100000L, -200000L)) // dim 1 seen once -> its own value
  }

  test("maxPool is partitioning-independent") {
    val rows = (0 until 500).map(i =>
      ((i % 5).toLong, Seq(math.sin(i.toDouble), -math.cos(i.toDouble))))
    val df = rows.toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Pooling.maxPool(d, "id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(11)))
  }

  test("truncation quantization matches the SQL cast twin") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val df = Seq(Seq(0.1234567, -0.9999995, 0.0000004)).toDF("v")
    val viaAgg = df.groupBy(lit(1)).agg(VectorFunctions.vecSumMicro($"v").as("s"))
      .select("s").as[Seq[Long]].head
    val viaSql = df.select(transform($"v",
        x => (x * 1e6).cast("long")).as("s")).as[Seq[Long]].head
    assert(viaAgg == viaSql)
  }

  test("a null vector ELEMENT is corrupt input and throws, not a silent 0.0") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    // ArrayData.getDouble on a null slot decodes 0.0 — a mean-pooled
    // dimension would be silently biased and n_vecs could never know.
    val df = Seq((1L, Seq(Option(1.0), Option.empty[Double])),
      (1L, Seq(Option(3.0), Option(4.0)))).toDF("k", "v")
    def assertNullElementThrow(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("|")
      assert(chain.contains("null element"), chain)
    }
    assertNullElementThrow(
      df.groupBy($"k").agg(VectorFunctions.vecSumMicro($"v")).collect())
    assertNullElementThrow(
      df.groupBy($"k").agg(VectorFunctions.vecMaxMicro($"v")).collect())
    // whole-vector nulls stay SKIPPED (the documented contract)
    val ok = Seq((1L, Option(Seq(1.0, 2.0))), (1L, Option.empty[Seq[Double]]))
      .toDF("k", "v")
    val got = ok.groupBy($"k").agg(VectorFunctions.vecSumMicro($"v").as("s"))
      .select("s").as[Seq[Long]].head
    assert(got == Seq(1000000L, 2000000L))
    // NON-FINITE elements are equally corrupt input: NaN quantized
    // silently to 0 (the exact bias the null guard exists to prevent)
    // and Infinity saturated then WRAPPED on the next add.
    def assertNonFiniteThrow(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("|")
      assert(chain.contains("non-finite"), chain)
    }
    val nan = Seq((1L, Seq(1.0, Double.NaN)), (1L, Seq(3.0, 4.0))).toDF("k", "v")
    assertNonFiniteThrow(
      nan.groupBy($"k").agg(VectorFunctions.vecSumMicro($"v")).collect())
    val inf = Seq((1L, Seq(Double.PositiveInfinity, 2.0))).toDF("k", "v")
    assertNonFiniteThrow(
      inf.groupBy($"k").agg(VectorFunctions.vecMaxMicro($"v")).collect())
    // finiteVec is the documented caller escape: broken vectors become
    // whole-vector NULLs (the aggregates' skip), clean rows still pool.
    val pooled = nan.groupBy($"k")
      .agg(VectorFunctions.vecSumMicro(VectorFunctions.finiteVec($"v")).as("s"))
      .select("s").as[Seq[Long]].head
    assert(pooled == Seq(3000000L, 4000000L))
  }
}
