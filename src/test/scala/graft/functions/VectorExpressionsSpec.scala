package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.embed.HashEmbedder
import graft.functions.VectorFunctions._

/** The fused codegen expressions must be BIT-IDENTICAL to the pure-SQL
  * higher-order-function forms — external oracles replicate the SQL
  * forms, so any drift would break the correctness gate. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // pseudo-random but deterministic vectors incl. negatives/zeros
  private lazy val df = {
    val emb = HashEmbedder(48)
    (0 until 200).map(i => (i.toLong, emb.embedQuery(s"left $i").toSeq,
      emb.embedQuery(s"right ${i % 7}").toSeq)).toDF("id", "a", "b")
  }

  test("dotProduct fused == SQL form, bitwise") {
    val bad = df.where(dotProduct($"a", $"b") =!= dotProductSql($"a", $"b")).count()
    assert(bad == 0)
  }

  test("cosineSimilarity fused == SQL form, bitwise") {
    val bad = df.where(cosineSimilarity($"a", $"b") =!= cosineSimilaritySql($"a", $"b")).count()
    assert(bad == 0)
  }

  test("l2Distance fused == SQL form, bitwise") {
    val bad = df.where(l2Distance($"a", $"b") =!= l2DistanceSql($"a", $"b")).count()
    assert(bad == 0)
  }

  test("fused HashEmbedExpr == SQL embed form, bitwise") {
    val emb = HashEmbedder(32)
    val texts = (0 until 50).map(i => s"document $i with words").toDF("text")
    val bad = texts.where(emb.embedCol($"text") =!= emb.embedColSql($"text")).count()
    assert(bad == 0)
  }

  test("fused expressions survive float input (cast path)") {
    val f = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(f.select(dotProduct($"a", $"b")).as[Double].head == 32.0)
    assert(f.select(l2Distance($"a", $"b")).as[Double].head == math.sqrt(27))
  }

  test("null array yields null score") {
    val withNull = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = withNull.select(dotProduct($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
  }

  test("dimension mismatch yields NULL — matching the zip_with twins, never a truncated score") {
    // A 2-dim vs 3-dim pair: the old min-length loop scored the shared
    // prefix (plausible but WRONG — an inflated cosine could take rank
    // 1); the SQL twins null out (zip_with null-pads -> null fold), and
    // the fused kernels must be indistinguishable from them on EVERY
    // input. Both engines (codegen'd select AND interpreted eval via a
    // filter that defeats codegen are covered by the parity tests).
    val mixed = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (2L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))).toDF("id", "a", "b")
    def nullsOf(c: org.apache.spark.sql.Column): Seq[Boolean] =
      mixed.orderBy("id").select(c).collect().map(_.isNullAt(0)).toSeq
    for (f <- Seq(dotProduct _, cosineSimilarity _, l2Distance _)) {
      assert(nullsOf(f($"a", $"b")) == Seq(true, false))
    }
    // fused == SQL twin on the mismatched input too (null == null)
    val bad = mixed.where(
      !(dotProduct($"a", $"b") <=> dotProductSql($"a", $"b")) ||
      !(cosineSimilarity($"a", $"b") <=> cosineSimilaritySql($"a", $"b")) ||
      !(l2Distance($"a", $"b") <=> l2DistanceSql($"a", $"b"))).count()
    assert(bad == 0)
  }
}
