package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run as partition-batched
  * transforms so a real codec (JNI/FFI or subprocess) amortizes its
  * setup across a whole partition.
  *
  * The actual byte decoding is STUBBED (this container has no
  * image/audio libraries): [[StubCodec]] is a clearly-marked
  * deterministic fake. Everything Spark-side — schema, batching,
  * partition sizing, output shape — is real and tested; swapping in a
  * real codec changes only the function bodies in StubCodec.
  *
  * (The reference's video/QR layer is a storage codec, not a media
  * pipeline — SURVEY §1 maps it to Parquet. This module is the
  * BASELINE.json "multimodal columns" pipeline extra.)
  */
object Multimodal {

  /** Typed metadata carried beside the raw bytes. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),   // image|audio|video
    StructField("format", StringType, nullable = true),      // png|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MediaMetaSchema, nullable = false)))

  /** ======== STUB CODEC — deterministic fake, NOT a real decoder ======
    * Replace these bodies with real codec calls (e.g. libjpeg/ffmpeg via
    * JNI or subprocess) in a full deployment. Shapes and determinism
    * contract: same bytes -> same output. */
  object StubCodec {
    /** Fake "decode + feature-extract": a `featureDim`-float signature
      * derived from the byte content (stands in for e.g. a CLIP/VGG
      * embedding of a decoded image). */
    def features(content: Array[Byte], featureDim: Int): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < content.length) {
        out(i % featureDim) += (content(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    /** Fake "resize": byte-decimation preserving a deterministic prefix
      * relation (stands in for an image rescale). */
    def resize(content: Array[Byte], maxBytes: Int): Array[Byte] =
      if (content.length <= maxBytes) content
      else {
        val step = math.max(1, content.length / maxBytes)
        content.indices.collect { case i if i % step == 0 => content(i) }
          .take(maxBytes).toArray
      }

    /** Fake "frame sample": cut the payload into `n` equal chunks
      * (stands in for decoding every k-th video frame). An EMPTY
      * payload still yields one empty frame: grouped() over zero bytes
      * is an empty iterator, which silently dropped the asset from the
      * exploded output — the one shape where "no frames" is
      * indistinguishable from "asset lost". */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (content.isEmpty) Seq(Array.emptyByteArray)
      else {
        val size = math.max(1, content.length / math.max(n, 1))
        content.grouped(size).take(n).toSeq
      }
    }
  }
  // ====================================================================

  /** Synthesize a deterministic asset table from any keyed DataFrame
    * (test substrate: the container has no real media files). Bytes are
    * sha-derived from the key so every stage downstream is reproducible. */
  def synthesizeAssets(df: DataFrame, idCol: String, payloadBytes: Int = 4096): DataFrame = {
    df.select(col(idCol).cast("long").as("asset_id")).withColumn("content",
        // chained sha digests concatenated as hex, unhexed ONCE at the
        // end (binary through concat_ws would be lossily cast to UTF-8)
        expr(s"""
          unhex(substring(
            concat_ws('', transform(sequence(1, ${payloadBytes / 32 + 1}),
              i -> sha2(concat(CAST(asset_id AS STRING), ':', CAST(i AS STRING)), 256))),
            1, ${payloadBytes * 2}))"""))
      .withColumn("meta", struct(
        when(col("asset_id") % 3 === 0, "image")
          .when(col("asset_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        lit("stub").as("format"),
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), (col("asset_id") % 1000 * 40).as("duration_ms")))
  }

  /** Decode + feature-extract, batched per partition. The iterator form
    * is the point: a real codec initializes once per partition, then
    * streams rows through — the Scala analog of pandas-batched UDFs. */
  def extractFeatures(assets: DataFrame, featureDim: Int = 64): DataFrame = {
    // Driver-side screens, like every sibling op: a bad argument must
    // fail HERE, not as an ArithmeticException buried in an executor
    // task's stack trace (i % featureDim below).
    require(featureDim > 0, s"featureDim must be positive, got $featureDim")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    assets.select("asset_id", "content", "meta.modality").mapPartitions { rows =>
      // <- real codec: initialize decoder/session HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
          StubCodec.features(bytes, featureDim).toSeq, bytes.length)
      }
    }(enc)
  }

  /** Resize/transcode pass: binary-in binary-out, partition-batched. */
  def resizeAssets(assets: DataFrame, maxBytes: Int): DataFrame = {
    // maxBytes = 0 divides by zero inside StubCodec.resize on the
    // executor; negative silently truncates everything to nothing.
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    assets.select("asset_id", "content").mapPartitions { rows =>
      rows.map { r =>
        Row(r.getAs[Long]("asset_id"),
          StubCodec.resize(r.getAs[Array[Byte]]("content"), maxBytes))
      }
    }(enc)
  }

  /** Frame sampling: one input video row -> n frame rows (explode shape;
    * downstream stages parallelize over frames, not videos — this is
    * what keeps one 2-hour video from pinning one task at 100 TB). */
  def sampleFrames(assets: DataFrame, framesPerAsset: Int): DataFrame = {
    // framesPerAsset <= 0 silently emitted zero rows per asset — every
    // asset vanished from the exploded output with no error.
    require(framesPerAsset > 0,
      s"framesPerAsset must be positive, got $framesPerAsset")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    assets.select("asset_id", "content").mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]]("content"), framesPerAsset)
          .zipWithIndex.map { case (f, i) => Row(r.getAs[Long]("asset_id"), i, f) }
      }
    }(enc)
  }
}
