package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run as partition-batched
  * transforms so a real codec amortizes its setup across a whole
  * partition.
  *
  * Image (PNG/BMP/GIF/JPEG via the JDK's javax.imageio) and WAV-PCM
  * audio decoding are REAL — [[MediaCodec]], pure JVM, no external
  * libraries — with exact integer stats and a 63-bit perceptual hash
  * that an external SQL engine replays analytically (the
  * q_image_decode / q_audio_features oracles). Only formats the JDK
  * cannot decode (MP4 video frames, MP3) still go through
  * [[StubCodec]], the clearly-marked deterministic fake; swapping in a
  * real video codec changes only those function bodies.
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
    * Scope (r14): ONLY the formats the JDK cannot decode still land
    * here — video frame extraction (MP4/...) and compressed audio
    * (MP3). Image and WAV decoding are real ([[MediaCodec]]). Replace
    * these bodies with real codec calls (e.g. ffmpeg via JNI or
    * subprocess) in a full deployment. Shapes and determinism
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
    keyedBytes(assets, col("meta.modality").as("modality")).mapPartitions { rows =>
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
    keyedBytes(assets).mapPartitions { rows =>
      rows.map { r =>
        Row(r.getAs[Long]("asset_id"),
          StubCodec.resize(r.getAs[Array[Byte]]("content"), maxBytes))
      }
    }(enc)
  }

  // ======== REAL codecs (image via javax.imageio, WAV via RIFF parse) ==

  /** Synthesize REAL image assets (test substrate — the testdata has no
    * media columns): a 64x48 grayscale gradient per key,
    * gray(id, x, y) = (id*31 + x*7 + y*13) mod 256, encoded through
    * the JDK's actual PNG (even ids) / BMP (odd ids) writers. Both
    * formats are lossless, so downstream decode stats replay
    * ANALYTICALLY from this formula — the oracle never has to decode
    * anything. Narrow mapPartitions; the encoder is JVM-local state
    * initialized per partition, the 100 TB shape for any real codec. */
  def synthesizeImageAssets(df: DataFrame, idCol: String,
                            width: Int = 64, height: Int = 48): DataFrame = {
    require(width % 8 == 0 && height % 8 == 0,
      s"synthesized images must be 8-divisible for aHash63, got ${width}x$height")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = MediaCodec.encodeGray(width, height, fmt)((x, y) =>
          (Math.floorMod(id * 31 + x * 7 + y * 13, 256L)).toInt)
        Row(id, fmt, bytes)
      }
    }(enc)
  }

  /** Synthesize DIVERSE real image assets — the gate fixture
    * ([[synthesizeImageAssets]]' gradient family is deliberately
    * self-similar: a brightness shift leaves aHash63 nearly invariant,
    * so a banded gate drops almost everything and a fixture needs
    * the opposite: mostly-unique hashes with CONTROLLED duplicate
    * classes). Pixels are constant over the aHash 8x8 cell grid, one
    * sha-derived byte per (seed, cell) — sha because anything weaker
    * degenerates: an affine-mod-256 formula is a pure brightness
    * shift between seeds (aHash-invariant), and two rounds of
    * multiply-mod mixing still collapsed 500 seeds to 72 distinct
    * hashes (measured). With sha cells each asset's hash is an
    * id-specific uniform 63-bit pattern, so 16-bit band collisions
    * between distinct seeds are rare, and the seeding plants exact
    * duplicate classes across and within parities:
    *   id % 17 == 1 -> seed id-1 (duplicates an EVEN neighbor),
    *   id % 23 == 2 -> seed id-2 (duplicates a SAME-parity neighbor),
    * which a parity-split gate fixture turns into cross-batch and
    * in-batch drops respectively (sf0.01: 206 kept / 10 in-batch /
    * 34 cross of 250). The cell byte replays in SQL as the first hex
    * pair of sha256('<seed>:<cx>:<cy>'). */
  def synthesizeCellImageAssets(df: DataFrame, idCol: String,
                                width: Int = 64, height: Int = 48): DataFrame = {
    require(width % 8 == 0 && height % 8 == 0,
      s"synthesized images must be 8-divisible for aHash63, got ${width}x$height")
    val cw = width / 8
    val ch = height / 8
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val id = r.getLong(0)
        val seed =
          if (id % 17 == 1) id - 1
          else if (id % 23 == 2) id - 2
          else id
        val cells = Array.tabulate(64) { j =>
          md.reset()
          md.update(s"$seed:${j % 8}:${j / 8}".getBytes("UTF-8"))
          md.digest()(0) & 0xFF
        }
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = MediaCodec.encodeGray(width, height, fmt)((x, y) =>
          cells((y / ch) * 8 + (x / cw)))
        Row(id, fmt, bytes)
      }
    }(enc)
  }

  /** Synthesize REAL COLOR image assets — the per-channel complement to
    * [[synthesizeImageAssets]]'s r=g=b gradient: three DISTINCT channel
    * formulas, so a decoder or stats path that silently judged only one
    * channel (the decodeGray red-channel contract) cannot pass the
    * per-channel oracle by accident:
    *   r(id,x,y) = (id*31 + x*7  + y*13) mod 256   (the gray formula)
    *   g(id,x,y) = (id*17 + x*11 + y*5 ) mod 256
    *   b(id,x,y) = (id*29 + x*3  + y*19) mod 256
    * PNG (even ids) / BMP (odd ids), both lossless for 24-bit color. */
  def synthesizeRgbImageAssets(df: DataFrame, idCol: String,
                               width: Int = 64, height: Int = 48): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = MediaCodec.encodeRgb(width, height, fmt) { (x, y) =>
          val cr = Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
          val cg = Math.floorMod(id * 17 + x * 11 + y * 5, 256L).toInt
          val cb = Math.floorMod(id * 29 + x * 3 + y * 19, 256L).toInt
          (cr << 16) | (cg << 8) | cb
        }
        Row(id, fmt, bytes)
      }
    }(enc)
  }

  /** REAL color decode + exact PER-CHANNEL feature extraction
    * ([[MediaCodec.decodeRgb]]/[[MediaCodec.rgbChannelStats]]): sum/
    * min/max for R, G, and B — the quality-gate inputs for real RGB
    * corpora, where the gray path's defined red-channel choice would
    * silently judge one channel (r14 verdict item #9). Same
    * corrupt-row and narrow-zero-shuffle contract as
    * [[decodeImageFeatures]]. */
  def decodeRgbFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_pixels", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("min_r", IntegerType, nullable = true),
      StructField("max_r", IntegerType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("min_g", IntegerType, nullable = true),
      StructField("max_g", IntegerType, nullable = true),
      StructField("sum_b", LongType, nullable = true),
      StructField("min_b", IntegerType, nullable = true),
      StructField("max_b", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    keyedBytes(assets).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        MediaCodec.decodeRgb(r.getAs[Array[Byte]](1)) match {
          case Some(img) =>
            val (n, (sr, mnr, mxr), (sg, mng, mxg), (sb, mnb, mxb)) =
              MediaCodec.rgbChannelStats(img)
            Row(id, true, img.width, img.height, n,
              sr, mnr, mxr, sg, mng, mxg, sb, mnb, mxb)
          case None =>
            Row(id, false, null, null, null, null, null, null,
              null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Synthesize REAL WAV-PCM16 audio assets: mono 16 kHz,
    * n = 256 + (id mod 7)*64 samples,
    * s(id, i) = ((id*37 + i*97) mod 2001) - 1000 — a ±1000 pseudo-
    * sawtooth whose peak/RMS/zero-crossing features replay analytically. */
  def synthesizeAudioAssets(df: DataFrame, idCol: String,
                            sampleRate: Int = 16000): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = 256 + Math.floorMod(id, 7L).toInt * 64
        val samples = Array.tabulate(n)(i =>
          Math.floorMod(id * 37 + i.toLong * 97, 2001L).toInt - 1000)
        Row(id, MediaCodec.encodeWavPcm16(sampleRate, samples))
      }
    }(enc)
  }

  /** Synthesize REAL WAV-PCM16 audio with sha-DIVERSE frame content —
    * the audio twin of [[synthesizeCellImageAssets]], built for the
    * streaming ingest-gate oracle (q_audio_gate). The sawtooth family
    * above is hash63-LUMPY (380 distinct hashes of 500 clips): under a
    * band gate nearly everything collides and the gate degenerates to
    * drop-almost-all, which pins very little. Here each clip is 63
    * frames of 8 CONSTANT samples, the frame value sha-derived
    * (v = sha256("seed:f")[0]·4 − 510), so unrelated clips get
    * near-unique frame-energy hashes — while the seed mapping plants
    * controlled duplicate classes: ids ≡ 1 (mod 17) replay id−1's
    * audio (opposite parity → cross-batch evidence under the even/odd
    * batch split) and ids ≡ 2 (mod 23) replay id−2's (same parity →
    * in-batch evidence). Frame-constant samples keep the oracle
    * analytic WITHOUT a per-sample fold: energy_f = 8·v², and the
    * 63·8 = 504-sample length divides into exactly 63 remainder-free
    * frames. */
  def synthesizeShaAudioAssets(df: DataFrame, idCol: String,
                               sampleRate: Int = 16000): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val id = r.getLong(0)
        val seed =
          if (id % 17 == 1) id - 1
          else if (id % 23 == 2) id - 2
          else id
        val samples = new Array[Int](504)
        var f = 0
        while (f < 63) {
          md.reset()
          md.update(s"$seed:$f".getBytes("UTF-8"))
          val v = (md.digest()(0) & 0xFF) * 4 - 510
          java.util.Arrays.fill(samples, f * 8, f * 8 + 8, v)
          f += 1
        }
        Row(id, MediaCodec.encodeWavPcm16(sampleRate, samples))
      }
    }(enc)
  }

  /** Key + bytes prep shared by every byte-consuming op: the id CASTS
    * to long (a production table keyed by INT works instead of killing
    * every task with a ClassCastException), and unattributable assets
    * are SCREENED on the CAST result — cast first, then null-filter,
    * so an ansi-off session's cast-failed garbage id lands in the same
    * screened bucket as a null id instead of slipping past a pre-cast
    * null check and silently attributing its row to asset 0 (raw
    * getLong unboxes null to 0). Under ANSI a garbage id is a loud
    * per-row cast error. Same contract class as the text ops' null-id
    * screens: the output schemas declare asset_id non-null. */
  private def keyedBytes(assets: DataFrame, extra: Column*): DataFrame =
    assets
      .select((col("asset_id").cast("long").as("asset_id") +:
        col("content") +: extra): _*)
      .where(col("asset_id").isNotNull)

  /** REAL image decode + exact feature extraction, batched per
    * partition: format-sniffing ImageIO decode (PNG/BMP/GIF/JPEG/...),
    * integer stats, and the sign-safe 63-bit average hash
    * ([[MediaCodec.aHash63]] — pairs with graft_hamming64 for banded
    * perceptual near-dup joins, same join shape as the SimHash text
    * path). Corrupt/undecodable bytes become a decode_ok=false row
    * with null features — a bad asset in a web-scale corpus is a
    * flagged row, never a dead task. aHash is null (not an error) for
    * non-8-divisible decoded sizes. Narrow: no shuffle, scales with
    * partition count; one pathological giant asset pins one task —
    * cap asset size upstream, not here. */
  def decodeImageFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_pixels", LongType, nullable = true),
      StructField("sum_gray", LongType, nullable = true),
      StructField("min_gray", IntegerType, nullable = true),
      StructField("max_gray", IntegerType, nullable = true),
      StructField("sum_sq_gray", LongType, nullable = true),
      StructField("n_distinct_gray", IntegerType, nullable = true),
      StructField("top_gray_freq", LongType, nullable = true),
      StructField("ahash63", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    keyedBytes(assets).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        MediaCodec.decodeGray(r.getAs[Array[Byte]](1)) match {
          case Some(img) =>
            val (n, sum, mn, mx) = MediaCodec.grayStats(img)
            val (sumSq, nDist, topFreq) = MediaCodec.grayQualityStats(img)
            val hash: java.lang.Long =
              if (img.width % 8 == 0 && img.height % 8 == 0)
                MediaCodec.aHash63(img)
              else null
            Row(id, true, img.width, img.height, n, sum, mn, mx,
              sumSq, nDist, topFreq, hash)
          case None =>
            Row(id, false, null, null, null, null, null, null,
              null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL WAV decode + exact feature extraction: sample counts, peak,
    * sum of squares (RMS stays a downstream sqrt so engines round
    * once), zero crossings. Same corrupt-row contract as
    * [[decodeImageFeatures]]. */
  def decodeAudioFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("peak", IntegerType, nullable = true),
      StructField("sum_sq", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true),
      StructField("audio_hash63", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    keyedBytes(assets).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        MediaCodec.decodeWav(r.getAs[Array[Byte]](1)) match {
          case Some(a) =>
            val (n, peak, sumSq, zc) = MediaCodec.audioStats(a)
            val hash: java.lang.Long =
              MediaCodec.audioHash63(a).map(Long.box).orNull
            Row(id, true, a.sampleRate, a.channels, n, peak, sumSq, zc, hash)
          case None =>
            Row(id, false, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL thumbnail pass: decode, exact 2x box-downscale
    * ([[MediaCodec.downscale2x]] — integer floor means, so resized
    * stats replay analytically), re-encode as PNG. Binary-in
    * binary-out like [[resizeAssets]]; odd-dimensioned or undecodable
    * inputs pass through unchanged with resized=false (a thumbnail
    * pipeline must never lose assets it cannot shrink). */
  def downscaleImages(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("resized", BooleanType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    keyedBytes(assets).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        MediaCodec.decodeGray(bytes) match {
          case Some(img) if img.width % 2 == 0 && img.height % 2 == 0 =>
            val small = MediaCodec.downscale2x(img)
            Row(id, true, MediaCodec.encodeGray(small.width, small.height,
              "png")((x, y) => small.gray(y * small.width + x)))
          case _ => Row(id, false, bytes)
        }
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
    keyedBytes(assets).mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]]("content"), framesPerAsset)
          .zipWithIndex.map { case (f, i) => Row(r.getAs[Long]("asset_id"), i, f) }
      }
    }(enc)
  }
}
