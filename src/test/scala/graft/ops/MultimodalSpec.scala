package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.synthesizeAssets(
    (0L until 30L).toDF("id"), "id", payloadBytes = 1024)

  test("synthesized assets: deterministic bytes, typed metadata, modality mix") {
    val rows = assets.collect()
    assert(rows.length == 30)
    val byId = rows.map(r => r.getAs[Long]("asset_id") ->
      r.getAs[Array[Byte]]("content")).toMap
    assert(byId.values.forall(_.length == 1024))
    // determinism: re-synthesize -> identical bytes
    val again = Multimodal.synthesizeAssets((0L until 30L).toDF("id"), "id", 1024)
      .collect().map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("content")).toMap
    assert(byId.keys.forall(k => byId(k).sameElements(again(k))))
    val modalities = rows.map(_.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("modality")).toSet
    assert(modalities == Set("image", "audio", "video"))
  }

  test("extractFeatures: partition-batched, fixed dim, deterministic") {
    val f = Multimodal.extractFeatures(assets, featureDim = 16).collect()
    assert(f.length == 30)
    assert(f.forall(_.getAs[Seq[Float]]("features").length == 16))
    assert(f.forall(_.getAs[Int]("n_bytes") == 1024))
    val f2 = Multimodal.extractFeatures(assets, featureDim = 16).collect()
    val m1 = f.map(r => r.getAs[Long]("asset_id") -> r.getAs[Seq[Float]]("features")).toMap
    val m2 = f2.map(r => r.getAs[Long]("asset_id") -> r.getAs[Seq[Float]]("features")).toMap
    assert(m1 == m2)
  }

  test("resizeAssets caps payload size") {
    val r = Multimodal.resizeAssets(assets, maxBytes = 100).collect()
    assert(r.forall(_.getAs[Array[Byte]]("content").length <= 100))
  }

  test("sampleFrames explodes one row per frame") {
    val frames = Multimodal.sampleFrames(assets, framesPerAsset = 4)
    assert(frames.count() == 30 * 4)
    val perAsset = frames.groupBy("asset_id").count().collect()
    assert(perAsset.forall(_.getAs[Long]("count") == 4))
  }

  test("bad numeric arguments fail at the driver, not in an executor task") {
    // Pre-screen these crashed inside StubCodec on the executor
    // (divide-by-zero / negative array size) or silently emitted zero
    // rows (framesPerAsset <= 0 made every asset vanish).
    intercept[IllegalArgumentException] { Multimodal.extractFeatures(assets, 0) }
    intercept[IllegalArgumentException] { Multimodal.extractFeatures(assets, -4) }
    intercept[IllegalArgumentException] { Multimodal.resizeAssets(assets, 0) }
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(assets, 0) }
  }

  test("an empty payload still yields one (empty) frame — assets never vanish") {
    import org.apache.spark.sql.functions._
    val withEmpty = assets.limit(2)
      .withColumn("content", when(col("asset_id") === 0L,
        lit(Array.emptyByteArray)).otherwise(col("content")))
    val frames = Multimodal.sampleFrames(withEmpty, framesPerAsset = 4).collect()
    val empties = frames.filter(_.getAs[Long]("asset_id") == 0L)
    assert(empties.length == 1 && empties.head.getAs[Array[Byte]]("frame").isEmpty)
    assert(frames.count(_.getAs[Long]("asset_id") == 1L) == 4)
  }

  // ---- REAL codec path (MediaCodec-backed) ----

  private lazy val imageAssets = Multimodal.synthesizeImageAssets(
    (0L until 12L).toDF("id"), "id")

  test("real image pipeline: synthesized PNG/BMP decode back to the formula") {
    val feats = Multimodal.decodeImageFeatures(imageAssets).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(feats.size == 12)
    (0L until 12L).foreach { id =>
      val r = feats(id)
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[Int]("width") == 64 && r.getAs[Int]("height") == 48)
      // analytic expectation, same fold the DuckDB oracle runs
      val vals = for (y <- 0 until 48; x <- 0 until 64)
        yield Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
      assert(r.getAs[Long]("n_pixels") == 3072L)
      assert(r.getAs[Long]("sum_gray") == vals.map(_.toLong).sum)
      assert(r.getAs[Int]("min_gray") == vals.min)
      assert(r.getAs[Int]("max_gray") == vals.max)
      assert(r.getAs[Long]("ahash63") >= 0L)
    }
  }

  test("corrupt bytes become a decode_ok=false row, never a dead task") {
    import org.apache.spark.sql.functions._
    val withBad = imageAssets.withColumn("content",
      when(col("asset_id") === 3L, lit("not an image".getBytes))
        .otherwise(col("content")))
    val feats = Multimodal.decodeImageFeatures(withBad).collect()
    assert(feats.length == 12)
    val bad = feats.find(_.getAs[Long]("asset_id") == 3L).get
    assert(!bad.getAs[Boolean]("decode_ok") && bad.isNullAt(bad.fieldIndex("ahash63")))
    assert(feats.count(_.getAs[Boolean]("decode_ok")) == 11)
  }

  test("perceptual near-dup: aHash63 + hamming64 pairs originals with noisy twins") {
    import org.apache.spark.sql.functions._
    // twin assets: same gradient with +6 brightness (id offset encodes
    // nothing — pixel formula shifted), re-encoded; aHash should land
    // within a few bits of the original, far from other images
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      imageAssets.schema)
    val twins = imageAssets.mapPartitions { rows =>
      rows.map { r => // positional: (asset_id, format, content)
        val img = MediaCodec.decodeGray(r.getAs[Array[Byte]](2)).get
        val shifted = MediaCodec.GrayImage(img.width, img.height,
          img.gray.map(g => (g + 6) min 255))
        org.apache.spark.sql.Row(r.getLong(0) + 1000L,
          "png", MediaCodec.encodeGray(shifted.width, shifted.height, "png")(
            (x, y) => shifted.gray(y * shifted.width + x)))
      }
    }(enc)
    val all = Multimodal.decodeImageFeatures(imageAssets.unionByName(twins))
      .select(col("asset_id"), col("ahash63"))
    val a = all.where(col("asset_id") < 1000L).withColumnRenamed("ahash63", "ha")
    val b = all.where(col("asset_id") >= 1000L)
      .select((col("asset_id") - 1000L).as("asset_id"), col("ahash63").as("hb"))
    val joined = a.join(b, "asset_id").select(
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.Hamming64Expr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("ha")),
          org.apache.spark.sql.GraftSqlBridge.expression(col("hb"))))
        .cast("long").as("d"))
      .collect().map(_.getLong(0))
    assert(joined.forall(_ <= 6), s"twin distances: ${joined.toSeq}")
  }

  test("downscaleImages: exact 2x box means, pass-through for undecodable") {
    import org.apache.spark.sql.functions._
    val withBad = imageAssets.limit(3).withColumn("content",
      when(col("asset_id") === 2L, lit(Array[Byte](9, 9, 9)))
        .otherwise(col("content")))
    val out = Multimodal.downscaleImages(withBad).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(!out(2L).getAs[Boolean]("resized") &&
      out(2L).getAs[Array[Byte]]("content").toSeq == Seq[Byte](9, 9, 9))
    val small = MediaCodec.decodeGray(out(0L).getAs[Array[Byte]]("content")).get
    assert(small.width == 32 && small.height == 24)
    def g(x: Int, y: Int): Int = Math.floorMod(0L * 31 + x * 7 + y * 13, 256L).toInt
    for (y <- 0 until 24; x <- 0 until 32)
      assert(small.gray(y * 32 + x) ==
        (g(2 * x, 2 * y) + g(2 * x + 1, 2 * y) + g(2 * x, 2 * y + 1) +
          g(2 * x + 1, 2 * y + 1)) / 4)
  }

  test("decodeImageFeatures runs unchanged on a STREAM (narrow mapPartitions)") {
    // the decode pass is stateless and narrow, so the same operator
    // must work under Structured Streaming without a variant — the
    // shape a live crawl-ingest pipeline uses
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bytes = (0L until 4L).map { id =>
      (id, MediaCodec.encodeGray(16, 16, "png")((x, y) =>
        Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt))
    }
    val input = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.decodeImageFeatures(
        input.toDF().toDF("asset_id", "content"))
      .writeStream.format("memory").queryName("media_stream_out")
      .outputMode("append").start()
    try {
      input.addData(bytes: _*)
      q.processAllAvailable()
      val rows = spark.table("media_stream_out").collect()
      assert(rows.length == 4)
      assert(rows.forall(_.getAs[Boolean]("decode_ok")))
      assert(rows.forall(_.getAs[Int]("width") == 16))
    } finally q.stop()
  }

  test("real audio pipeline: WAV features match the analytic fold") {
    val audio = Multimodal.synthesizeAudioAssets((0L until 10L).toDF("id"), "id")
    val feats = Multimodal.decodeAudioFeatures(audio).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    (0L until 10L).foreach { id =>
      val n = 256 + Math.floorMod(id, 7L).toInt * 64
      val s = Array.tabulate(n)(i =>
        Math.floorMod(id * 37 + i.toLong * 97, 2001L).toInt - 1000)
      val r = feats(id)
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[Int]("sample_rate") == 16000)
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Int]("peak") == s.map(math.abs).max)
      assert(r.getAs[Long]("sum_sq") == s.map(v => v.toLong * v).sum)
      assert(r.getAs[Long]("zero_crossings") ==
        (1 until n).count(i => s(i - 1).toLong * s(i) < 0).toLong)
    }
  }

  test("sha-audio fixture: hash matches the frame-constant fold; duplicate classes planted") {
    // The q_audio_gate fixture contract: 63 frames × 8 constant
    // samples, v = sha256("seed:f")[0]·4 − 510, so audioHash63's
    // general fold must land exactly on the analytic shortcut
    // (energy_f = 8·v², lower-median, bit f = e_f > median) the DuckDB
    // oracle computes — and the seed mapping must plant byte-identical
    // replays at id ≡ 1 (mod 17) → id−1 and id ≡ 2 (mod 23) → id−2.
    val ids = (0L until 60L).toDF("id")
    val bytes = Multimodal.synthesizeShaAudioAssets(ids, "id").collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("content")).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def expectedHash(seed: Long): Long = {
      val e = Array.tabulate(63) { f =>
        md.reset(); md.update(s"$seed:$f".getBytes("UTF-8"))
        val v = (md.digest()(0) & 0xFF) * 4 - 510
        8L * v * v
      }
      val m = e.sorted.apply(31) // lower median of 63
      (0 until 63).map(f => if (e(f) > m) 1L << f else 0L).sum
    }
    val hashes = Multimodal.decodeAudioFeatures(
        Multimodal.synthesizeShaAudioAssets(ids, "id")).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("audio_hash63")).toMap
    assert(hashes(0L) == expectedHash(0L) && hashes(5L) == expectedHash(5L) &&
      hashes(40L) == expectedHash(40L))
    // Duplicate planting: 18 ≡ 1 (mod 17) replays 17 (cross-parity);
    // 25 ≡ 2 (mod 23) replays 23 (same parity). Unrelated neighbors
    // differ.
    assert(java.util.Arrays.equals(bytes(18L), bytes(17L)))
    assert(java.util.Arrays.equals(bytes(25L), bytes(23L)))
    assert(!java.util.Arrays.equals(bytes(10L), bytes(11L)))
  }
}
