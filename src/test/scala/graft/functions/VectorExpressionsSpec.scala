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
}
