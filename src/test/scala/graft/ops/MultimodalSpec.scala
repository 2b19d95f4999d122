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
}
