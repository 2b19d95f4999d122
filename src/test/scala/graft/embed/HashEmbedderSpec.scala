package graft.embed

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.HashFunctions

class HashEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val emb = HashEmbedder(dim = 16)

  test("deterministic per text, distinct across texts") {
    val a1 = emb.embedQuery("hello world")
    val a2 = emb.embedQuery("hello world")
    val b = emb.embedQuery("goodbye world")
    assert(a1 sameElements a2)
    assert(!(a1 sameElements b))
    assert(a1.length == 16)
  }

  test("unit L2 norm") {
    val v = emb.embedQuery("some text")
    val n = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("distributed embed is bit-identical to driver-side embedQuery") {
    val texts = Seq("alpha", "beta gamma", "delta epsilon zeta")
    val df = texts.toDF("text")
    val got = emb.embed(df, "text", "vec")
      .select($"text", $"vec").as[(String, Seq[Double])].collect().toMap
    texts.foreach { t =>
      assert(got(t) == emb.embedQuery(t).toSeq, s"mismatch for '$t'")
    }
  }

  test("hash60 SQL form equals hash60Local") {
    val df = Seq("abc", "", "héllo ünicode", "0:long seed text").toDF("s")
    val rows = df.select($"s", HashFunctions.hash60($"s").as("h"))
      .as[(String, Long)].collect()
    rows.foreach { case (s, h) =>
      assert(h == HashFunctions.hash60Local(s), s"mismatch for '$s'")
      assert(h >= 0)
    }
  }
}
