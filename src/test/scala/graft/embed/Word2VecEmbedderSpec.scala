package graft.embed

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class Word2VecEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "spark cluster compute engine distributed",
    "spark engine query compute",
    "cat dog pet animal fur",
    "dog cat animal pet"
  ).toDF("text")

  test("fit -> embed: unit vectors for in-vocab docs, zero vector for OOV-only docs") {
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    val docs = Seq((0L, "spark compute engine"), (1L, "zzz qqq www")).toDF("id", "text")
    val out = emb.embed(docs, "text", "vec").orderBy("id")
      .select("vec").as[Seq[Double]].collect()
    val norm0 = math.sqrt(out(0).map(x => x * x).sum)
    assert(math.abs(norm0 - 1.0) < 1e-3, s"in-vocab doc should be ~unit, got $norm0")
    assert(out(1).forall(_ == 0.0), "OOV-only doc should embed as the zero vector")
  }

  test("embedQuery is BIT-IDENTICAL to the distributed embed path (Embedder contract)") {
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    for (text <- Seq("spark engine distributed", "  spark  engine", "cat")) {
      val viaJob = emb.embed(Seq((0L, text)).toDF("id", "text"), "text", "vec")
        .select("vec").as[Seq[Double]].head
      val viaDriver = emb.embedQuery(text)
      assert(viaJob == viaDriver.toSeq,
        s"'$text': job=$viaJob driver=${viaDriver.toSeq}")
    }
  }

  test("embedQuery parity holds on uppercase ASCII and non-ASCII text") {
    // fit/embed tokenize through SQL lower(); embedQuery must lowercase
    // byte-identically (ASCII fast path + default-locale slow path for
    // non-ASCII), or a query stops retrieving its own stored document.
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    for (text <- Seq("SPARK Engine COMPUTE", "CAT ÉCOLE dog", "Straße SPARK cat")) {
      val viaJob = emb.embed(Seq((0L, text)).toDF("id", "text"), "text", "vec")
        .select("vec").as[Seq[Double]].head
      assert(viaJob == emb.embedQuery(text).toSeq, s"parity broke on '$text'")
    }
  }

  test("save/load round-trip reproduces embeddings exactly") {
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    val dir = Files.createTempDirectory("graft-w2v").toString + "/vecs"
    emb.save(spark, dir)
    val loaded = Word2VecEmbedder.load(spark, dir)
    assert(loaded.dim == 16)
    val docs = Seq((0L, "spark compute"), (1L, "cat dog")).toDF("id", "text")
    val a = emb.embed(docs, "text", "vec").orderBy("id").select("vec")
      .as[Seq[Double]].collect().toSeq
    val b = loaded.embed(docs, "text", "vec").orderBy("id").select("vec")
      .as[Seq[Double]].collect().toSeq
    assert(a == b)
  }

  test("load restores fit-time minCount/seed; an empty saved vocabulary is refused loudly") {
    // "spark"/"compute"/"engine"/"cat"/"dog"/"pet"/"animal" appear
    // twice in the corpus, the rest once: minCount = 2 keeps a real
    // vocabulary while proving the params round-trip (load used to
    // reconstruct with the DEFAULTS, so a re-fit on the loaded
    // instance silently trained a different vocabulary).
    val emb = Word2VecEmbedder(dim = 16, minCount = 2, seed = 7L)
      .fit(corpus, "text")
    val dir = Files.createTempDirectory("graft-w2v-p").toString + "/vecs"
    emb.save(spark, dir)
    val loaded = Word2VecEmbedder.load(spark, dir)
    assert(loaded.minCount == 2 && loaded.seed == 7L && loaded.dim == 16)
    val emptyDir = Files.createTempDirectory("graft-w2v-e").toString + "/vecs"
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__w",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__wv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      .write.parquet(emptyDir)
    val ex = intercept[IllegalStateException](
      Word2VecEmbedder.load(spark, emptyDir))
    assert(ex.getMessage.contains("EMPTY"))
  }

  test("broadcastEmbedder: streaming-safe twin, embeddings BIT-IDENTICAL to the batch path") {
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    val bcast = emb.broadcastEmbedder(spark)
    assert(bcast.streamingSafe && !emb.streamingSafe)
    assert(bcast.dim == emb.dim)
    val docs = Seq((0L, "spark compute engine"), (1L, "zzz qqq www"),
      (2L, "CAT ÉCOLE dog"), (3L, "  spark  engine"), (4L, null))
      .toDF("id", "text")
    val viaBatch = emb.embed(docs, "text", "vec").orderBy("id")
      .select("vec").as[Seq[Double]].collect().toSeq
    val viaBcast = bcast.embed(docs, "text", "vec").orderBy("id")
      .select("vec").as[Seq[Double]].collect().toSeq
    assert(viaBatch == viaBcast)
    // and its embedQuery keeps the Embedder contract against ITS embed
    for (text <- Seq("spark engine distributed", "CAT dog", "zzz"))
      assert(bcast.embedQuery(text).toSeq ==
        emb.embedQuery(text).toSeq, s"kernel drift on '$text'")
  }

  test("works as a DocumentStore embedder end-to-end") {
    val emb = Word2VecEmbedder(dim = 16).fit(corpus, "text")
    val dir = Files.createTempDirectory("graft-w2v-store").toString + "/store"
    val store = graft.store.DocumentStore.fromTexts(spark, dir,
      Seq("spark compute engine", "cat dog pet"), Nil, graft.StoreConfig(), emb)
    val hits = store.similaritySearch("spark engine", k = 2).collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("text") == "spark compute engine")
  }
}
