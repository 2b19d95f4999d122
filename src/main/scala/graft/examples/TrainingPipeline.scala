package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.HashEmbedder
import graft.functions.{TextFunctions, VectorFunctions}
import graft.ops.{Dedup, Packing, TextAnalysis}

/** End-to-end LLM training-data pipeline over the testdata corpus,
  * composing the library's operators the way a 100 TB run would:
  *
  *   quality filter -> exact dedup -> near-dup removal (MinHash-LSH
  *   pairs -> connected components -> keep canonical) -> chunk ->
  *   embed -> int8-quantize -> pack into training sequences ->
  *   write sharded parquet.
  *
  * Every stage is a declarative DataFrame transform: filters and
  * projections reach the parquet scan, dedup joins shuffle on keys (no
  * all-pairs anywhere), packing uses the bucketed two-phase cumsum, and
  * the final write is partitioned by packed sequence bucket so a
  * trainer can read shards independently.
  *
  * Run: sbt "runMain graft.examples.TrainingPipeline [sfDir] [outDir]"
  */
object TrainingPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-training-pipeline")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} docs")

    // 1. Quality gate: language + heuristic quality score.
    val quality = TextAnalysis.analyze(docs, "text")
      .where(col("quality") >= 0.5)
      .select("doc_id", "text", "lang", "n_tokens")
    println(s"after quality filter: ${quality.count()}")

    // 2. Exact dedup (normalized): keep the lowest doc_id per fingerprint.
    val exactKept = quality.join(
      Dedup.exact(quality, "doc_id", "text", normalize = true)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    println(s"after exact dedup: ${exactKept.count()}")

    // 3. Near-dup removal: MinHash-LSH candidates -> connected
    //    components -> one canonical doc per duplicate family.
    val pairs = Dedup.minhashLshPairs(exactKept, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val canonical = Dedup.keepCanonical(exactKept, "doc_id", pairs)
    println(s"after near-dup removal: ${canonical.count()}")

    // 4. Chunk long docs into overlapping token windows.
    val chunked = canonical.select(col("doc_id"), col("lang"),
        posexplode(TextFunctions.chunks(col("text"), chunkSize = 64, overlap = 8)))
      .withColumnRenamed("pos", "chunk_no").withColumnRenamed("col", "chunk")
    println(s"chunks: ${chunked.count()}")

    // 5. Embed + int8-quantize (4x smaller vectors, cosine preserved to
    //    quantization error).
    val embedded = HashEmbedder(64).embed(chunked, "chunk", "vec")
      .withColumn("qvec", VectorFunctions.quantizeInt8(col("vec")))
      .drop("vec")

    // 6. Pack chunks into fixed 2048-token training sequences (stable
    //    (doc_id, chunk_no) order via a dense per-chunk id).
    val withTokens = embedded
      .withColumn("chunk_tokens", TextFunctions.tokenCount(col("chunk")).cast("long"))
      .withColumn("chunk_id",
        col("doc_id") * 1000 + col("chunk_no")) // < 1000 chunks/doc at these sizes
    val packed = Packing.packSequences(withTokens, "chunk_id", "chunk_tokens",
      capacity = 2048, bucketWidth = 1 << 20)
    val nSeqs = packed.agg(max("seq_id")).head.getLong(0) + 1
    println(s"packed into $nSeqs sequences of <=2048 tokens")

    // 7. Shard by sequence bucket so trainers stream shards independently.
    packed
      .withColumn("shard", (col("seq_id") % 8).cast("int"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/shards")
    val written = spark.read.parquet(s"$outDir/shards")
    println(s"wrote ${written.count()} rows to $outDir/shards " +
      s"(${written.select("shard").distinct().count()} shards)")
    spark.stop()
  }
}
