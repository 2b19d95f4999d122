package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, MediaCodec, Multimodal}

/** End-to-end MULTIMODAL curation pipeline — the media twin of
  * [[TrainingPipeline]], composing the r14 real codecs the way an
  * image/audio corpus run would:
  *
  *   synthesize real PNG/BMP + WAV bytes (the container ships no media
  *   files; a production run reads them from parquet binary columns)
  *   -> corrupt-asset gate (decode_ok — flagged rows, never dead
  *   tasks) -> image quality gates (blank frame: n_distinct_gray = 1;
  *   dominated palette: top_gray_freq/n > 0.9; low contrast: variance
  *   below floor) -> perceptual near-dup removal (aHash63 ->
  *   banded Hamming pair join -> connected components -> keep the
  *   smallest id per family) -> audio gates (silence: peak below
  *   floor; mono-tone: zero-crossing rate out of band) -> thumbnail
  *   downscale for the survivors -> write curated assets + a decode
  *   audit table.
  *
  * Every stage is either a narrow partition-batched decode (zero
  * shuffle) or a key-bounded join (banding — never all-pairs), so the
  * pipeline's scale posture is the SCALE.md media rows' posture.
  *
  * Run: sbt "runMain graft.examples.MultimodalPipeline [sfDir] [outDir]"
  */
object MultimodalPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-mm-pipeline").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-multimodal-pipeline")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 0. Assets. A production run reads (asset_id, content, meta) from
    //    parquet; here the bytes are REAL encoded images/audio of known
    //    content, with a 2% corruption injection so the corrupt-row
    //    path is exercised end to end.
    // cached: three downstream actions (the count, the decode pass,
    // the step-5 semijoin into the thumbnail pass) would otherwise
    // re-run the ImageIO encode of the whole corpus each time
    val images = Multimodal.synthesizeImageAssets(docs, "doc_id")
      .withColumn("content",
        when(col("asset_id") % 50 === 7, lit("corrupt!".getBytes))
          .otherwise(col("content")))
      .cache()
    val audio = Multimodal.synthesizeAudioAssets(docs, "doc_id")
    println(s"assets: ${images.count()} images, ${audio.count()} audio clips")

    // 1. Decode + corrupt gate. decode_ok=false rows go to the audit
    //    table, not the trash — a 100 TB run wants the corruption RATE
    //    on a dashboard, not silently shrinking data.
    val feats = Multimodal.decodeImageFeatures(images)
    feats.cache()
    val corrupt = feats.where(!col("decode_ok"))
    println(s"corrupt images flagged: ${corrupt.count()}")

    // 2. Image quality gates (the Gopher-gate analog for pixels):
    //    blank frames, dominated palettes, contrast floor.
    val gated = feats.where(col("decode_ok"))
      .withColumn("variance_gray",
        col("sum_sq_gray").cast("double") / col("n_pixels").cast("double") -
          (col("sum_gray").cast("double") / col("n_pixels").cast("double")) *
          (col("sum_gray").cast("double") / col("n_pixels").cast("double")))
      .withColumn("top_gray_frac",
        col("top_gray_freq").cast("double") / col("n_pixels").cast("double"))
      .where(col("n_distinct_gray") > 1 &&
        col("top_gray_frac") <= 0.9 &&
        col("variance_gray") >= 16.0)
    println(s"after image quality gates: ${gated.count()}")

    // 2b. Per-channel gate (r15): the gray gates above judge one
    //     defined channel; real RGB corpora also want dead-channel
    //     detection (min == max on ANY channel — a stuck sensor or a
    //     tinted-overlay artifact that a gray/red-only pass misses
    //     whenever the OTHER channels carry the defect). One decode,
    //     all three channels, same flagged-not-dropped discipline.
    //     Both counts come out of ONE action (r15 ADVICE: two separate
    //     count() actions re-ran the decode — the dominant per-row cost
    //     this stage showcases — end to end twice).
    val rgbFeats = Multimodal.decodeRgbFeatures(
      Multimodal.synthesizeRgbImageAssets(docs, "doc_id"))
    val rgbCounts = rgbFeats.agg(
      count(lit(1)).as("n_rgb"),
      sum(when(col("decode_ok") &&
        (col("min_r") === col("max_r") ||
         col("min_g") === col("max_g") ||
         col("min_b") === col("max_b")), 1L).otherwise(0L)).as("n_dead"))
      .head
    println(s"dead-channel assets flagged (of ${rgbCounts.getLong(0)} RGB): " +
      s"${rgbCounts.getLong(1)}")

    // 3. Perceptual near-dup removal: banded Hamming pairs over the
    //    63-bit average hash, connected components, keep the smallest
    //    id per duplicate family (deterministic keeper). maxHamming = 0
    //    HERE (exact perceptual duplicates) because the synthetic
    //    gradient family is adversarially self-similar — at the
    //    production setting of 3-5 its transitive closure collapses the
    //    whole corpus into one family, which says something true about
    //    these gradients and nothing about the operator; a real image
    //    corpus keeps 3-5.
    val pairs = Dedup.fingerprintPairs(
      gated.select(col("asset_id"), col("ahash63")),
      "asset_id", "ahash63", maxHamming = 0, bands = 4)
    val comps = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
    val keepers = gated.join(
        comps.where(col("node") =!= col("component"))
          .select(col("node").as("asset_id")),
        Seq("asset_id"), "left_anti")
    println(s"after perceptual near-dup removal: ${keepers.count()}")

    // 4. Audio gates: silence floor and a plausible zero-crossing band
    //    (a stuck-tone clip crosses almost never; noise crosses almost
    //    every sample).
    val af = Multimodal.decodeAudioFeatures(audio)
      .where(col("decode_ok"))
      .withColumn("zcr",
        col("zero_crossings").cast("double") / col("n_samples").cast("double"))
      .where(col("peak") >= 100 && col("zcr").between(0.01, 0.95))
    println(s"audio clips surviving gates: ${af.count()}")

    // 5. Thumbnails for the survivors (exact 2x box downscale,
    //    re-encoded PNG) + writes: curated assets and the audit table.
    //    keepers derives FROM images, so the semijoin key is explicitly
    //    re-aliased — the self-lineage-join discipline Mutations
    //    follows (an unaliased join on shared-lineage columns is the
    //    ambiguous-self-join trap).
    val curated = Multimodal.downscaleImages(
      images.join(keepers.select(col("asset_id").as("__keep_id")),
          col("asset_id") === col("__keep_id"), "left_semi"))
    curated.write.mode("overwrite").parquet(s"$outDir/curated_thumbs")
    corrupt.select("asset_id").write.mode("overwrite")
      .parquet(s"$outDir/corrupt_audit")
    af.select("asset_id", "sample_rate", "n_samples", "peak", "zcr")
      .write.mode("overwrite").parquet(s"$outDir/curated_audio")
    val thumbs = spark.read.parquet(s"$outDir/curated_thumbs")
    println(s"wrote ${thumbs.count()} thumbnails " +
      s"(${thumbs.where(col("resized")).count()} downscaled) -> $outDir")

    // The decoded thumbnail of a surviving asset really is 32x24.
    val sample = thumbs.where(col("resized")).limit(1).collect()
    sample.foreach { r =>
      val img = MediaCodec.decodeGray(r.getAs[Array[Byte]]("content")).get
      println(s"thumbnail check: asset ${r.getAs[Long]("asset_id")} " +
        s"decodes to ${img.width}x${img.height}")
    }
    feats.unpersist()
    images.unpersist()
    spark.stop()
  }
}
