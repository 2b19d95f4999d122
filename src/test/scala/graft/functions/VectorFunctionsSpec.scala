package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(1.0, 1.0, 1.0), Seq(1.0, 1.0, 1.0))
  ).toDF("a", "b")

  test("dotProduct matches hand computation") {
    val r = df.select(dotProduct($"a", $"b").as("d")).as[Double].collect()
    assert(r sameElements Array(0.0, 32.0, 3.0))
  }

  test("cosineSimilarity: orthogonal=0, identical=1") {
    val r = df.select(round(cosineSimilarity($"a", $"b"), 9).as("c")).as[Double].collect()
    assert(r(0) == 0.0)
    assert(r(2) == 1.0)
    assert(math.abs(r(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-6)
  }

  test("l2Distance") {
    val r = df.select(l2Distance($"a", $"b").as("d")).as[Double].collect()
    assert(math.abs(r(0) - math.sqrt(2)) < 1e-12)
    assert(math.abs(r(1) - math.sqrt(27)) < 1e-12)
    assert(r(2) == 0.0)
  }

  test("l2Normalize produces unit vectors; zero vector unchanged") {
    val d2 = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("v")
    val r = d2.select(l2Normalize($"v").as("n")).as[Seq[Double]].collect()
    assert(r(0) == Seq(0.6, 0.8))
    assert(r(1) == Seq(0.0, 0.0))
  }

  test("score dispatch + direction") {
    assert(higherIsBetter("cosine") && higherIsBetter("ip") && !higherIsBetter("l2"))
    intercept[IllegalArgumentException](score("nope", lit(1), lit(1)))
  }

  test("float arrays are accepted (cast to double)") {
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = f.select(dotProduct($"a", $"b").as("d")).as[Double].collect()
    assert(r(0) == 11.0)
  }

  test("int8 quantization: known values, zero vector, BYTE elements") {
    val d = Seq(Seq(1.0, -0.5, 0.25, 0.0), Seq(0.0, 0.0, 0.0, 0.0)).toDF("v")
    val q = d.select(quantizeInt8($"v").as("q"))
    // 1-byte cells are the 4x-smaller claim AND what DotProductInt8Expr
    // reads — array<int> here silently broke the composition below.
    assert(q.schema("q").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val r = q.as[Seq[Byte]].collect()
    assert(r(0) == Seq[Byte](127, -64, 32, 0)) // round(-63.5) HALF_UP -> -64 (away from zero)
    assert(r(1) == Seq[Byte](0, 0, 0, 0))
  }

  test("quantizeInt8 composes with dotProductInt8 (the documented pairing)") {
    val d = Seq((Seq(1.0, -0.5, 0.25, 0.0), Seq(0.5, 0.5, -1.0, 0.25))).toDF("a", "b")
    val got = d.select(dotProductInt8(quantizeInt8($"a"), quantizeInt8($"b")).as("s"))
      .as[Long].head
    // q_a = [127,-64,32,0]; q_b = [64,64,-127,32] (0.5/1.0*127 = 63.5 -> 64)
    assert(got == 127L * 64 - 64L * 64 - 32L * 127)
    // mis-typed input (array<int>) is COERCED at analysis (implicit
    // numeric cast to array<tinyint> — correct VALUES), where pre-fix
    // getByte read garbage 1-byte strides across the 4-byte cells
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("x", "y")
    assert(ints.select(dotProductInt8($"x", $"y").as("s")).as[Long].head == 11L)
    // non-array input still fails analysis, not mid-task with a cast error
    val scalar = Seq((1, 2)).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      scalar.select(dotProductInt8($"x", $"y")).collect()
    }
  }

  test("binarySign63: known bit patterns and truncation at 63 dims") {
    // Bits set exactly where the dimension is strictly positive.
    val d = Seq(
      Seq(1.0, -2.0, 0.5, 0.0),            // bits 0 and 2 -> 5
      Seq(-1.0, -1.0),                      // no bits
      (0 until 64).map(_.toDouble + 1.0).toSeq // all positive; dim 63 ignored
    ).toDF("v")
    val r = d.select(binarySign63($"v").as("b")).as[Long].collect()
    assert(r(0) == 5L)
    assert(r(1) == 0L)
    assert(r(2) == (1L << 63) - 1) // 63 low bits, never the sign bit
    // empty vector -> 0 (would otherwise error under ANSI element_at)
    val e = Seq(Seq.empty[Double]).toDF("v")
      .select(binarySign63($"v").as("b")).as[Long].collect()
    assert(e(0) == 0L)
  }

  test("hammingDistance counts differing bits") {
    val d = Seq((5L, 6L), (0L, 0L), ((1L << 63) - 1, 0L)).toDF("a", "b")
    val r = d.select(hammingDistance($"a", $"b").as("h")).as[Int].collect()
    assert(r sameElements Array(2, 0, 63))
  }

  test("int8 round-trip keeps cosine within 0.5% on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val rt = emb
      .withColumn("scale", maxAbs($"v"))
      .withColumn("deq", dequantizeInt8(quantizeInt8($"v"), $"scale"))
      .select(cosineSimilarity($"v", $"deq").as("cos"))
      .as[Double].collect()
    assert(rt.nonEmpty)
    assert(rt.forall(_ > 0.995))
  }

  test("randomProjection: matches direct computation, seeded, shape") {
    val vec = (0 until 8).map(i => (i + 1) * 0.25)
    val signs = VectorFunctions.rpSigns("t", 4, 8)
    val expected = (0 until 4).map { j =>
      BigDecimal(vec.zip(signs(j)).map { case (x, s) => x * s }.sum / math.sqrt(4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Seq(Tuple1(vec)).toDF("v")
      .select(VectorFunctions.randomProjection($"v", "t", 4, 8).as("rp"))
      .as[Seq[Double]].head()
    assert(got == expected)
    // signs are genuinely mixed and seed-dependent
    assert(signs.flatten.toSet == Set(1.0, -1.0))
    assert(VectorFunctions.rpSigns("u", 4, 8) != signs)
    // JL sanity on unit vectors: projected inner products track the
    // originals closely on average (not a per-pair bound)
    val dim = 64
    val docs = (0 until 50).map { d =>
      val raw = (0 until dim).map(i =>
        math.sin(d * 31 + i * 7).abs + 0.1)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val proj = docs.map(v => (0 until 16).map { j =>
      v.zip(VectorFunctions.rpSigns("t", 16, dim)(j))
        .map { case (x, s) => x * s }.sum / math.sqrt(16.0)
    })
    val errs = for (a <- 0 until 10; b <- 0 until 10 if a < b) yield {
      val exact = docs(a).zip(docs(b)).map { case (x, y) => x * y }.sum
      val est = proj(a).zip(proj(b)).map { case (x, y) => x * y }.sum
      math.abs(exact - est)
    }
    assert(errs.sum / errs.size < 0.3, s"mean JL error ${errs.sum / errs.size}")
  }
}
