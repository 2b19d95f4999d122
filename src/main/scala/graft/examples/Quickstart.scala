package graft.examples

import org.apache.spark.sql.SparkSession
import graft.StoreConfig
import graft.embed.HashEmbedder
import graft.store.DocumentStore

/** Runnable end-to-end example mirroring the reference's quickstart
  * (reference examples/quickstart.py:31-92): build a store from the
  * canonical 6-document corpus, run 3 searches at k=2, delete every
  * other document by text, search again, print storage stats.
  *
  * Run: `sbt "runMain graft.examples.Quickstart"`
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .appName("graft-quickstart")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val texts = Seq(
      "The quick brown fox jumps over the lazy dog",
      "A fast orange fox leaps across a sleepy canine",
      "The weather is beautiful today",
      "It's raining cats and dogs outside",
      "Python is a popular programming language",
      "JavaScript is widely used for web development")
    val metas = Seq(
      Map("source" -> "example1.txt", "category" -> "animals"),
      Map("source" -> "example1.txt", "category" -> "animals"),
      Map("source" -> "example2.txt", "category" -> "weather"),
      Map("source" -> "example2.txt", "category" -> "weather"),
      Map("source" -> "example3.txt", "category" -> "programming"),
      Map("source" -> "example3.txt", "category" -> "programming"))

    val dir = java.nio.file.Files.createTempDirectory("graft-quickstart").toString + "/store"
    println(s"== building store at $dir ==")
    val store = DocumentStore.fromTexts(spark, dir, texts, metas,
      StoreConfig(metric = "cosine"), HashEmbedder(64))
    println(s"document count: ${store.documentCount}")

    val queries = Seq(
      "Tell me about foxes",
      "What's the weather like?",
      "What programming languages are mentioned?")
    queries.foreach { q =>
      println(s"\n== query: $q ==")
      store.similaritySearch(q, k = 2).show(20, 60)
    }

    println("== delete every other document by text ==")
    store.deleteByTexts(texts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t })
    println(s"document count after delete: ${store.documentCount}")
    queries.foreach { q =>
      println(s"\n== query (post-delete): $q ==")
      store.similaritySearch(q, k = 2).show(20, 60)
    }

    println("== reload from disk ==")
    val reloaded = DocumentStore.load(spark, dir, HashEmbedder(64))
    println(s"reloaded count: ${reloaded.documentCount}")
    val s = reloaded.storageStats
    println(s"stats: docs=${s.documentCount} payloadBytes=${s.payloadSizeBytes} " +
      s"indexBytes=${s.indexSizeBytes} coverage=${s.mapping.coveragePercent}%")
    spark.stop()
  }
}
