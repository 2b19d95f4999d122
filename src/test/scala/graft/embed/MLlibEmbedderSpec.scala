package graft.embed

import graft.SparkSpec

class MLlibEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a fast orange fox leaps across a sleepy canine",
    "python is a popular programming language",
    "javascript is widely used for web development",
    "the weather is beautiful today").toDF("text")

  test("fit + embed produce unit-norm vectors of the right dim") {
    val emb = MLlibEmbedder(dim = 256).fit(corpus, "text")
    val vecs = emb.embed(corpus, "text", "vec")
      .select("vec").as[Seq[Double]].collect()
    assert(vecs.forall(_.length == 256))
    vecs.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("embedQuery matches distributed embed bit-for-bit") {
    val emb = MLlibEmbedder(dim = 128).fit(corpus, "text")
    val texts = Seq("the quick brown fox", "programming language weather")
    val dist = emb.embed(texts.toDF("text"), "text", "vec")
      .select("text", "vec").as[(String, Seq[Double])].collect().toMap
    texts.foreach { t =>
      assert(dist(t) == emb.embedQuery(t).toSeq, s"mismatch for '$t'")
    }
  }

  test("tf-idf embeddings are semantically meaningful: shared-term docs score closer") {
    val emb = MLlibEmbedder(dim = 512).fit(corpus, "text")
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val fox1 = emb.embedQuery("the quick brown fox jumps over the lazy dog")
    val fox2 = emb.embedQuery("quick brown fox and lazy dog")
    val prog = emb.embedQuery("python programming language")
    assert(cos(fox1, fox2) > cos(fox1, prog))
  }

  test("embed before fit fails clearly") {
    intercept[IllegalStateException](MLlibEmbedder(64).embed(corpus, "text", "v"))
  }

  test("null text embeds as a NULL vector (no NPE); other rows unaffected") {
    // Tokenizer's lowercase UDF NPEs on null input — the embedder must
    // screen it and honor the family's null-text -> null-vec contract
    // (a HashEmbedder-backed pipeline must not die when switched here).
    val emb = MLlibEmbedder(dim = 32).fit(corpus, "text")
    val out = emb.embed(
        Seq((0L, "the quick fox"), (1L, null.asInstanceOf[String]))
          .toDF("id", "text"),
        "text", "vec")
      .orderBy("id").select("vec").collect()
    assert(out(0).getSeq[Double](0).length == 32)
    assert(out(1).isNullAt(0))
    val ex = intercept[IllegalArgumentException](emb.embedQuery(null))
    assert(ex.getMessage.contains("null"))
  }

  test("save/load round-trips the fitted weights") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idf").toString + "/idf"
    val emb = MLlibEmbedder(dim = 128).fit(corpus, "text")
    emb.save(spark, dir)
    val loaded = MLlibEmbedder.load(spark, dir)
    assert(loaded.dim == 128)
    val q = "the quick brown fox"
    assert(loaded.embedQuery(q).toSeq == emb.embedQuery(q).toSeq)
    val viaDf = loaded.embed(Seq(q).toDF("text"), "text", "vec")
      .select("vec").as[Seq[Double]].head()
    assert(viaDf == emb.embedQuery(q).toSeq)
  }
}
