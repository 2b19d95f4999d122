package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.StoreConfig
import graft.embed.HashEmbedder
import graft.store.DocumentStore

/** End-to-end RETRIEVAL pipeline over the document store — the serving
  * half of the library (the ingest half is TrainingPipeline): build a
  * store from the testdata documents, then run every retrieval surface
  * a RAG stack uses — dense top-k, keyword BM25 (persisted lexical
  * index), hybrid RRF fusion, MMR diversification, PQ-accelerated
  * approximate search, batched multi-query retrieval, and
  * full-metadata enrichment — against the same corpus.
  *
  * Run: sbt "runMain graft.examples.RagPipeline [sfDir]"
  */
object RagPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-rag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("metadata"))

    val dir = Files.createTempDirectory("graft-rag").toString + "/store"
    val store = DocumentStore.fromDF(spark, dir, docs, StoreConfig(), HashEmbedder(64))
    println(s"store: ${store.documentCount} docs at $dir")

    val query = "spark query engine performance"
    val terms = Seq("spark", "query", "engine")

    println("== dense top-3 ==")
    store.similaritySearch(query, k = 3).show(3, 60)

    println("== BM25 via persisted lexical index ==")
    store.buildLexicalIndex()
    store.searchLexical(terms, k = 3).show(3, 60)

    println("== hybrid RRF (keyword + dense) ==")
    store.hybridSearch(query, terms, k = 3).show(3, 60)

    println("== MMR-diversified top-3 ==")
    store.maxMarginalRelevanceSearch(query, k = 3, fetchK = 15).show(3, 60)

    println("== PQ-accelerated approximate top-3 ==")
    store.buildPqIndex(m = 8, ksub = 16)
    store.similaritySearchPq(query, k = 3, candidates = 50).show(3, 60)

    println("== batched retrieval: 3 queries, one job ==")
    store.similaritySearchBatch(
      Seq(query, "customer order data", "vector similarity"), k = 2).show(6, 60)

    println("== top hit with full payload metadata ==")
    store.similaritySearch(query, k = 1, includeFullMetadata = true).show(1, 60)

    println("== late-interaction (max-sim) over chunked long docs ==")
    // multi-vector retrieval: chunk every doc, embed each chunk, score
    // the doc by its BEST-matching chunk — the passage that matches is
    // never pooled away.
    val embedder = HashEmbedder(64)
    val chunkVecs = embedder.embed(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.chunks(col("text"), 32, 8))
            .as("chunk")),
      "chunk", "vec")
    graft.index.VectorIndex.maxSimTopK(chunkVecs, "doc_id", "vec",
      embedder.embedQuery(query).toSeq, k = 3).show(3, 60)

    println("== the same, as a STORE surface (multi-vector mode) ==")
    // chunkSize > 0 persists the chunk table with every snapshot;
    // searchMaxSim composes the (IVF-prunable) chunk space, the
    // best-chunk aggregate, and payload enrichment — the one-call
    // late-interaction sibling of similaritySearch.
    val mvDir = Files.createTempDirectory("graft-rag-mv").toString + "/store"
    val mvStore = DocumentStore.fromDF(spark, mvDir, docs,
      StoreConfig(chunkSize = 32, chunkOverlap = 8), HashEmbedder(64))
    mvStore.searchMaxSim(query, k = 3).show(3, 60)

    spark.stop()
  }
}
