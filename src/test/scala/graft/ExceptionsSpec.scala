package graft

import graft.embed.HashEmbedder
import graft.store.DocumentStore

/** Typed exception hierarchy (reference exceptions.py parity): the
  * right subtype per failure family, and every subtype still an
  * IllegalArgumentException (the pre-round-4 contract — old callers
  * catching IAE keep working). */
class ExceptionsSpec extends SparkSpec {

  private val emb = HashEmbedder(8)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-exc").toString + "/store"

  test("load of an absent store is a StorageException") {
    val e = intercept[StorageException] {
      DocumentStore.load(spark, tmp(), emb)
    }
    assert(e.isInstanceOf[IllegalArgumentException])
    assert(e.isInstanceOf[GraftException])
  }

  test("dim-mismatched load is an IndexException") {
    val dir = tmp()
    DocumentStore.fromTexts(spark, dir, Seq("a doc"), Nil, StoreConfig(), emb)
    intercept[IndexException] {
      DocumentStore.load(spark, dir, HashEmbedder(16))
    }
  }

  test("bad ingest batch shape is an IngestException") {
    val store = DocumentStore.fromTexts(spark, tmp(), Seq("a doc"), Nil, StoreConfig(), emb)
    intercept[IngestException] {
      store.addTexts(Seq("x", "y"), Seq(Map("a" -> "b")))
    }
  }

  test("searching an unbuilt store is a SearchException; bad delete ids an IndexException") {
    val dir = tmp()
    val empty = DocumentStore.fromTexts(spark, dir, Seq("a doc"), Nil, StoreConfig(), emb)
    empty.deleteByIds(Seq(0L)) // store dropped
    intercept[SearchException] { empty.similaritySearch("q") }
    val store = DocumentStore.fromTexts(spark, tmp(), Seq("a", "b"), Nil, StoreConfig(), emb)
    intercept[IndexException] { store.deleteByIds(Seq(5L)) }
  }

  test("out-of-range and genuinely-pruned time-travel reads are StorageExceptions") {
    // Branch 1: version beyond the manifest's range.
    val store = DocumentStore.fromTexts(spark, tmp(), Seq("a"), Nil, StoreConfig(), emb)
    intercept[StorageException] { store.essentialAt(99L) }
    // Branch 2: version IN range but its snapshot dir already swept.
    // keepVersions=1 + two mutations -> version 1 is retained-count out.
    val pruned = DocumentStore.fromTexts(spark, tmp(), Seq("a", "b"), Nil,
      StoreConfig(keepVersions = 1), emb)
    pruned.addTexts(Seq("c"))
    pruned.addTexts(Seq("d"))
    intercept[StorageException] { pruned.essentialAt(1L) }
  }
}
