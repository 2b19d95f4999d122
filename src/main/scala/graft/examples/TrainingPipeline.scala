package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.HashEmbedder
import graft.functions.{TextFunctions, VectorFunctions}
import graft.ops.{Contamination, Dedup, Packing, Pii, QualitySignals, Sampling, TextAnalysis}

/** End-to-end LLM training-data pipeline over the testdata corpus,
  * composing the library's operators the way a 100 TB run would:
  *
  *   contract gate -> distribution-drift gate (PSI vs the accepted
  *   snapshot) -> Unicode normalization (NFC) -> quality filter
  *   (language/length + Gopher repetition signals + per-language
  *   quantile gate) -> PII redaction -> exact dedup -> near-dup
  *   removal (MinHash-LSH pairs -> connected components -> keep the
  *   BEST-quality member per family) -> benchmark decontamination ->
  *   corpus-boilerplate span cut -> leakage-safe train/valid/test
  *   split by source -> tokenizer training (train split only) ->
  *   domain mixing (per-language epochs) -> chunk -> embed ->
  *   int8-quantize -> pack into training sequences -> seeded
  *   deterministic shard shuffle -> write sharded parquet.
  *
  * Every stage is a declarative DataFrame transform: filters and
  * projections reach the parquet scan, dedup/decontamination joins
  * shuffle on keys (no all-pairs anywhere), packing uses the bucketed
  * two-phase cumsum, and the final write is partitioned by shard so a
  * trainer can read shards independently — with the row order inside
  * each shard fully determined by (seed, doc key), not by cluster
  * shape.
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} docs")

    // 0. Contract gate: refuse the input drop outright if its schema
    //    contract is broken (the cheap insurance every pipeline run
    //    buys before burning cluster hours on bad data).
    val contract = graft.ops.Checks.report(Seq(
      graft.ops.Checks.uniqueKey(docs, Seq("doc_id")),
      graft.ops.Checks.notNull(docs, Seq("doc_id", "text")),
      graft.ops.Checks.inRange(docs, "n_chars", 1, 1000000)))
    val broken = contract.where(!col("pass")).collect()
    require(broken.isEmpty,
      s"input contract violated: ${broken.mkString("; ")}")
    println("input contract: all checks pass")

    // 0b. Distribution-drift gate: before this drop joins the corpus,
    //     compare its language and length histograms against the
    //     accepted reference snapshot (simulated here as the even-id
    //     half). One corpus pass scores ALL features; PSI > 0.25 is
    //     the standard act-now threshold.
    val drift = graft.ops.Drift.multiFeatureContributions(docs,
        isRef = col("doc_id") % 2 === 0,
        features = Seq("lang" -> col("lang"),
          "len" -> graft.ops.Drift.numericBucket(col("n_chars"),
            Seq(60.0, 100.0, 140.0, 180.0))))
      .groupBy("feature").agg(round(sum("psi_contrib"), 4).as("psi"))
      .collect().map(r => s"${r.getString(0)}=${r.getDouble(1)}").mkString(", ")
    println(s"drift gate (PSI vs reference snapshot): $drift")

    // 1. Unicode normalization (NFC + format-char strip + whitespace
    //    collapse) BEFORE anything keyed on bytes — then the quality
    //    gate: language + heuristic score + Gopher repetition signals,
    //    topped by a PER-LANGUAGE quantile gate (keep each language's
    //    top 70% by its OWN score distribution, so a weak language
    //    isn't wiped out by a strong one's scale).
    val normalized = docs.select(col("doc_id"),
      TextFunctions.normalizeText(col("text")).as("text"),
      col("lang"), col("source"))
    val quality0 = QualitySignals.ngramCharSignals(
        QualitySignals.signals(
          TextAnalysis.analyze(normalized, "text")
            .where(col("quality") >= 0.5)
            .select("doc_id", "text", "lang", "source", "n_tokens", "quality"),
          "text")
          .where(col("gopher_keep")),
        "text")
      .where(col("rep_keep"))
    // STAGE BOUNDARY: materialize the gated corpus. The quality gate
    // is the most expensive per-row projection in the pipeline (deep
    // HOF repetition signals); without a boundary, every downstream
    // action would RE-EXECUTE it through the unpersisted lineage —
    // and at 100 TB a real pipeline writes stage outputs to storage
    // anyway (restartability + lineage truncation).
    graft.ops.Stats.keepAboveQuantile(
        quality0.select("doc_id", "text", "lang", "source", "quality"),
        Seq("lang"), "quality", q = 0.3)
      .select("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$outDir/gated")
    val quality = spark.read.parquet(s"$outDir/gated")
    println(s"after quality + repetition + per-lang quantile: ${quality.count()}")

    // 2. PII scrub (narrow regex pass; counts kept for auditing).
    val scrubbed = Pii.redact(quality, "text", "clean_text")
      .select(col("doc_id"), col("clean_text").as("text"),
        col("lang"), col("source"))

    // 3. Exact dedup (normalized): keep the lowest doc_id per fingerprint.
    val exactKept = scrubbed.join(
      Dedup.exact(scrubbed, "doc_id", "text", normalize = true)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    println(s"after exact dedup: ${exactKept.count()}")

    // 4. Near-dup removal: MinHash-LSH candidates -> connected
    //    components -> one canonical doc per duplicate family. The
    //    containment pairs (common/min) additionally catch short
    //    excerpts embedded in longer docs, which symmetric Jaccard
    //    structurally under-scores — both pair sets feed the graph.
    //    The one-pass (pairs, stats) form: the hot-band observability
    //    (did capPerBand drop anything? how hot is the hottest bucket?)
    //    rides the pairs action as observed metrics — no second
    //    shingle+minhash pass, logged below right where a production
    //    dedup job's audit trail wants it.
    val (pairs, lshObs) = Dedup.minhashLshPairsWithStats(exactKept,
      "doc_id", "text", n = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val excerpts = Dedup.ngramContainmentPairs(exactKept, "doc_id", "text",
      n = 3, threshold = 0.9)
      .select("id_a", "id_b")
    val allPairs = pairs.select("id_a", "id_b").unionByName(excerpts).distinct()
    // Keep the BEST member of each duplicate family (longest normalized
    // text, ties to smallest id) — production dedup keeps quality, not
    // whichever id happens to be smallest.
    val comps = Dedup.connectedComponents(allPairs)
    val keepers = Dedup.bestRepresentative(comps,
        exactKept.withColumn("len", length(col("text"))), "doc_id", "len")
      .select(col("keeper_doc_id").as("doc_id"))
    val canonical = exactKept
      .join(comps.select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(exactKept.join(keepers, Seq("doc_id"), "left_semi"))
    println(s"after near-dup removal (quality keeper per family, incl. " +
      s"excerpt containment): ${canonical.count()}")
    // Free with the pairs action above (no extra scan or job):
    val lshStats = lshObs.get
    println(s"LSH band audit: hot_buckets=${lshStats("hot_buckets")} " +
      s"dropped_rows=${lshStats("dropped_rows")} " +
      s"max_bucket=${lshStats("max_bucket")} (capPerBand=1024)")

    // 4b. Incremental-ingest posture (what a FOLLOW-UP shard of this
    //     corpus would run): screen a simulated new batch against the
    //     kept corpus — Bloom prescreen (definitely-new rows skip the
    //     join), exact confirm, then cross-side near-dup only. Shown
    //     here on a slice so the whole screen is exercised end to end.
    // The batch goes through the SAME normalizeText as the corpus did
    // at step 1 and the screen uses normalize=true like step 3's dedup:
    // raw batch text against normalized corpus text made a re-crawled
    // duplicate with ANY whitespace/Unicode variation read as
    // "definitely new" at the Bloom (byte-exact key) and then slip the
    // shingle screen too (an unsplit 'Hello\nworld' is one token). The
    // doc_id bound keeps the batch a FIXED size — the broadcast premise
    // of the cross-side helpers — rather than a corpus-proportional
    // slice that would outgrow it at real scale.
    val incomingBatch = docs
      .where(col("doc_id") % 101 === 0 && col("doc_id") <= 101L * 5000)
      .select(col("doc_id"), Pii.redactCol(
        TextFunctions.normalizeText(col("text"))).as("text"))
    val screened = Dedup.bloomExactAgainst(incomingBatch, canonical, "text",
      normalize = true)
    val accepted = screened.join(
      Dedup.ngramJaccardAgainst(screened, canonical, "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(col("batch_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    println(s"incremental screen: ${incomingBatch.count()} incoming -> " +
      s"${accepted.count()} accepted")

    // 5. Benchmark decontamination: drop docs sharing too many 3-grams
    //    with the held-out "benchmark" slice (here: doc_id % 97 == 0).
    //    The bench side goes through the SAME normalizeText AND PII
    //    redaction as the corpus, so both texts live in one n-gram
    //    space — raw bench text against normalized corpus text put the
    //    two sides in DIFFERENT token spaces (tokens() splits on the
    //    single space normalizeText produces), so any multi-line or
    //    NFC-variant benchmark passage silently missed the gate. The
    //    doc_id bound keeps the bench set a FIXED size (the broadcast
    //    premise of Contamination's bench-gram table).
    val bench = docs
      .where(col("doc_id") % 97 === 0 && col("doc_id") <= 97L * 5000)
      .select(col("doc_id"), Pii.redactCol(
        TextFunctions.normalizeText(col("text"))).as("text"))
    val decontaminated = Contamination.decontaminate(
      canonical.where(col("doc_id") % 97 =!= 0), bench,
      "doc_id", "text", n = 3, maxFrac = 0.8)
    println(s"after decontamination: ${decontaminated.count()}")

    // 5c. Corpus-boilerplate cut: 8-token spans repeated across >= 4
    //     distinct docs (nav chrome, license headers) are removed IN
    //     PLACE — documents survive with the boilerplate cut out, and
    //     a passage merely shared by two docs is left alone.
    val boilerRanges = Dedup.duplicateSpanRanges(decontaminated,
      "doc_id", "text", window = 8, minDocs = 4)
    val cleaned = Dedup.removeSpanRanges(decontaminated, boilerRanges,
        "doc_id", "text")
      .where(col("text") =!= "")
      .select("doc_id", "text")
      .join(decontaminated.select("doc_id", "lang", "source"), "doc_id")
    println(s"boilerplate cut: " +
      s"${boilerRanges.select("doc_id").distinct().count()} docs trimmed")

    // 5d. Leakage-safe splits BEFORE packing: whole SOURCES are
    //     assigned to train/valid/test by deterministic hash, so
    //     near-dups within a source can never straddle train and eval;
    //     only the train split flows into tokenizer + sequences.
    val split = Sampling.splitByGroup(cleaned, "source",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)), salt = "r7")
    split.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(s"  split ${r.getString(0)}: ${r.getLong(1)} docs"))
    val trainDocs = split.where(col("split") === "train").drop("split")

    // 5b. Tokenizer training on the TRAIN split only (distributed word
    //     counting + driver merge loop — the vocabulary is MBs where
    //     the corpus is TBs): the merge table ships with the dataset.
    val merges = graft.ops.Bpe.train(trainDocs, "text", numMerges = 50)
    graft.ops.Bpe.mergesDF(spark, merges)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/bpe_merges")
    println(s"BPE: trained ${merges.length} merges; first 3 = " +
      merges.take(3).map { case (l, r) => s"$l+$r" }.mkString(", "))

    // 6. Chunk long docs into overlapping token windows.
    val chunked = trainDocs.select(col("doc_id"), col("lang"),
        posexplode(TextFunctions.chunks(col("text"), chunkSize = 64, overlap = 8)))
      .withColumnRenamed("pos", "chunk_no").withColumnRenamed("col", "chunk")
    println(s"chunks: ${chunked.count()}")

    // 7. Embed + int8-quantize (4x smaller vectors, cosine preserved to
    //    quantization error).
    val embeddedFull = HashEmbedder(64).embed(chunked, "chunk", "vec")
    val embedded = embeddedFull
      .withColumn("qvec", VectorFunctions.quantizeInt8(col("vec")))
      .drop("vec")

    // 7b. MEASURE the quantization's retrieval cost instead of assuming
    //     it: recall@10 of top-k over dequantized int8 vectors vs the
    //     full-precision scan, for a few sample queries (Eval.recallAtK
    //     — the shortcut-shipping discipline: every approximation gets
    //     a recall number).
    val chunkVecs = embeddedFull
      .withColumn("cid", col("doc_id") * 100000 + col("chunk_no"))
      .select(col("cid"), col("vec"))
    val dequant = chunkVecs
      .withColumn("scale", VectorFunctions.maxAbs(col("vec")))
      .withColumn("vec", VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8(col("vec")), col("scale")))
      .drop("scale")
    val sampleQs = chunkVecs.orderBy("cid").limit(3).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    import spark.implicits._
    val qdf = sampleQs.toSeq.toDF("qid", "qv")
    def top10(space: org.apache.spark.sql.DataFrame) =
      graft.index.VectorIndex.topKBatch(space, "vec", qdf, "qid", "qv",
        k = 10, "cosine", scoreCol = "score", tieBreak = Seq("cid"),
        roundScale = 6, keep = Some(col("cid") =!= col("qid")))
    val recall = graft.ops.Eval.recallAtK(top10(chunkVecs), top10(dequant),
      "qid", "cid")
      .agg(round(avg("recall"), 4).as("mean_recall")).head.getDouble(0)
    println(s"int8 retrieval recall@10 vs full precision: $recall")

    // 8. Domain mixing AFTER embedding: epoch copies are byte-identical,
    //    so embedding before mixing computes each vector once, not once
    //    per epoch. Keyed by doc_id, so a doc's fractional-epoch
    //    decision is consistent across all its chunks.
    val mixed = Sampling.epochMix(embedded, "doc_id", "lang",
      weights = Map("en" -> 1.0, "de" -> 2.0, "es" -> 1.5, "fr" -> 1.5),
      defaultWeight = 1.0)
    println(s"after domain mixing: ${mixed.count()} chunk rows (with repeats)")

    // 9. Pack chunks into fixed 2048-token training sequences (stable
    //    (doc_id, copy_id, chunk_no) order via a dense per-chunk id;
    //    radix leaves headroom for 10k chunks/doc and 10 epoch copies).
    val withTokens = mixed
      .withColumn("chunk_tokens", TextFunctions.tokenCount(col("chunk")).cast("long"))
      .withColumn("chunk_id",
        col("doc_id") * 100000 + col("copy_id") * 10000 + col("chunk_no"))
    val packed = Packing.packSequences(withTokens, "chunk_id", "chunk_tokens",
      capacity = 2048, bucketWidth = 1 << 20)
    val nSeqs = packed.agg(max("seq_id")).head.getLong(0) + 1
    println(s"packed into $nSeqs sequences of <=2048 tokens")

    // 10. Seeded deterministic shuffle into shards, keyed by SEQUENCE:
    //     a training sequence's chunks land in one shard, contiguous,
    //     in chunk order — a trainer streams any shard independently —
    //     and the order is a pure function of (seed, seq_id), so
    //     rerunning on a different cluster shape reproduces identical
    //     shards.
    val sharded = Sampling.seededShuffle(packed, "seq_id", nShards = 8,
      seed = "epoch0", tieCols = Seq("chunk_id"))
    sharded
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/shards")
    val written = spark.read.parquet(s"$outDir/shards")
    println(s"wrote ${written.count()} rows to $outDir/shards " +
      s"(${written.select("shard").distinct().count()} shards)")

    // 11. Contrastive negatives for the embedding-training variant of
    //     this corpus: 2 deterministic partners per surviving doc.
    val negs = Sampling.negativePairs(
      docs.select("doc_id", "lang"), "doc_id", k = 2, seed = "epoch0",
      partnerCols = Seq("lang"))
    println(s"negative pairs: ${negs.count()}")

    // 12. Analytics-side layout: the events table re-clustered on the
    //     (user_id, time-cell) Morton curve so per-user time-boxed
    //     queries prune files on both dimensions.
    // ts is TIMESTAMP_NTZ (parquet micros): hour cells via epoch micros.
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("tcell",
        (expr("unix_micros(CAST(ts AS TIMESTAMP))") / lit(3600L * 1000000L))
          .cast("long") % 1024)
      .withColumn("ucell", col("user_id") % 1024)
    graft.ops.Layout.zorderWrite(events, Seq("ucell", "tcell"),
      s"$outDir/events_zorder", numFiles = 8)
    println(s"z-ordered events: ${spark.read.parquet(s"$outDir/events_zorder").count()}")

    // 13. Store-maintenance advisory: a retrieval store fed by this
    //     pipeline's incremental appends degrades in measurable ways
    //     (new small files per batch, a dedup Bloom sized for the
    //     original count, centroid drift on IVF stores).
    //     recommendCompaction names what it detected; compact() fixes
    //     all of it in one snapshot rewrite.
    val storeDir = s"$outDir/maint_store"
    val maint = graft.store.DocumentStore.fromDF(spark, storeDir,
      docs.limit(60).select(col("text"),
        map(lit("source"), col("source")).as("metadata")),
      graft.StoreConfig(), graft.embed.HashEmbedder(64))
    (0 until 10).foreach { i =>
      maint.addDFIncremental(
        Seq((s"synthetic maintenance append batch $i", Map("source" -> s"b$i")))
          .toDF("text", "metadata"))
    }
    println(s"compaction advisory after 10 appends: " +
      maint.recommendCompaction().mkString("[", "; ", "]"))
    maint.compact()
    println(s"compaction advisory after compact(): " +
      maint.recommendCompaction().mkString("[", "; ", "]"))
    spark.stop()
  }
}
