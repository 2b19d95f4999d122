package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, StoreConfig}
import graft.embed.HashEmbedder
import graft.store.DocumentStore

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("ingestStream: micro-batches append to the store with dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Map[String, String])]
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = DocumentStore.fromTexts(spark, s"$dir/store",
      Seq("seed doc"), Nil, StoreConfig(), HashEmbedder(16))
    val q = StreamingOps.ingestStream(
      input.toDF().toDF("text", "metadata"), store, s"$dir/ckpt")
    try {
      input.addData(("batch one doc", Map("source" -> "s1")), ("seed doc", Map.empty[String, String]))
      q.processAllAvailable()
      assert(store.documentCount == 2) // "seed doc" deduped against store
      input.addData(("batch two doc", Map.empty[String, String]))
      q.processAllAvailable()
      assert(store.documentCount == 3)
    } finally q.stop()
  }

  test("nearDupIngestStream: LSH gate drops within-batch and cross-batch near-dups, passes shingle-less rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val dir = Files.createTempDirectory("graft-neardup").toString
    val q = StreamingOps.nearDupIngestStream(
      input.toDF().toDF("id", "text", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt")
    try {
      // Batch 1: doc 2 is an exact near-dup of doc 1 (identical text →
      // jaccard 1.0 → every band collides → guaranteed drop; arrival
      // order = (ts, id)); doc 3 is distinct; doc 4 has < n tokens (no
      // shingles → no evidence → passes).
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2L, "the quick brown fox jumps over the lazy dog", ts(1)),
        (3L, "completely different text about spark streaming engines and state", ts(2)),
        (4L, "tiny", ts(3)))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept1 == Set(1L, 3L, 4L), s"batch 1 kept: $kept1")
      // Batch 2: doc 5 replays doc 1's text → dropped against the
      // PERSISTED index (cross-batch); doc 6 is new and survives.
      input.addData(
        (5L, "the quick brown fox jumps over the lazy dog", ts(10)),
        (6L, "yet another unrelated document mentioning catalysts and codegen", ts(11)))
      q.processAllAvailable()
      val kept2 = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(1L, 3L, 4L, 6L), s"after batch 2 kept: $kept2")
      // Index holds retained docs' bands only: doc 1's 4 bands + doc
      // 3's 4 + doc 6's 4 (doc 4 banded nothing) — and is
      // duplicate-free by construction.
      val bands = spark.read.parquet(s"$dir/index").collect().map(_.getString(0))
      assert(bands.length == 12 && bands.distinct.length == 12,
        s"index bands: ${bands.length} (${bands.distinct.length} distinct)")
    } finally q.stop()
  }

  test("imageNearDupIngestStream: perceptual gate drops identical/near images, passes undecodable bytes") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.MediaCodec
    def png(base: Long, shift: Int): Array[Byte] =
      MediaCodec.encodeGray(64, 48, "png")((x, y) =>
        (Math.floorMod(base * 31 + x * 7 + y * 13, 256L).toInt + shift) min 255)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val dir = Files.createTempDirectory("graft-imgdup").toString
    val q = StreamingOps.imageNearDupIngestStream(
      input.toDF().toDF("asset_id", "content", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt")
    try {
      // Batch 1: asset 2 is byte-identical imagery to asset 1 (every
      // band collides -> drop); asset 3 is a different gradient;
      // asset 4 is undecodable (null hash -> no evidence -> passes).
      input.addData(
        (1L, png(5L, 0), ts(0)),
        (2L, png(5L, 0), ts(1)),
        (3L, png(77L, 0), ts(2)),
        (4L, "not an image".getBytes, ts(3)))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$dir/kept").select("asset_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept1 == Set(1L, 3L, 4L), s"batch 1 kept: $kept1")
      // Batch 2: asset 5 is asset 1's image with a tiny brightness
      // shift — the perceptual hash keeps enough bands identical that
      // the cross-batch probe drops it; asset 6 is new.
      input.addData(
        (5L, png(5L, 2), ts(10)),
        (6L, png(200L, 0), ts(11)))
      q.processAllAvailable()
      val kept2 = spark.read.parquet(s"$dir/kept").select("asset_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(1L, 3L, 4L, 6L), s"after batch 2 kept: $kept2")
      // Index holds retained assets' bands only (asset 4 banded
      // nothing), duplicate-free within each asset's 4 bands.
      val bands = spark.read.parquet(s"$dir/index").collect().map(_.getString(0))
      assert(bands.length == 12, s"index bands: ${bands.length}")
    } finally q.stop()
  }

  test("audioNearDupIngestStream: gate drops identical clips, passes undecodable and too-short ones") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.MediaCodec
    def wav(seed: Long, n: Int): Array[Byte] =
      MediaCodec.encodeWavPcm16(16000, Array.tabulate(n)(i =>
        Math.floorMod(seed * 37 + i.toLong * 97, 2001L).toInt - 1000))
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val dir = Files.createTempDirectory("graft-auddup").toString
    val q = StreamingOps.audioNearDupIngestStream(
      input.toDF().toDF("asset_id", "content", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt")
    try {
      // Batch 1: clip 2 is byte-identical audio to clip 1 (every band
      // collides -> in-batch drop, first arrival by (ts, id) keeps 1);
      // clip 3 is a different sawtooth; clip 4 is undecodable and clip
      // 5 is shorter than 63 samples — both null-hash, both PASS (the
      // no-evidence contract).
      input.addData(
        (1L, wav(5L, 320), ts(0)),
        (2L, wav(5L, 320), ts(1)),
        (3L, wav(77L, 320), ts(2)),
        (4L, "not audio".getBytes, ts(3)),
        (5L, wav(9L, 50), ts(4)))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$dir/kept").select("asset_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept1 == Set(1L, 3L, 4L, 5L), s"batch 1 kept: $kept1")
      // Batch 2: clip 6 replays clip 1's audio -> dropped against the
      // PERSISTED index (cross-batch, survivors-only); clip 7 is new.
      input.addData(
        (6L, wav(5L, 320), ts(10)),
        (7L, wav(123L, 320), ts(11)))
      q.processAllAvailable()
      val kept2 = spark.read.parquet(s"$dir/kept").select("asset_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(1L, 3L, 4L, 5L, 7L), s"after batch 2 kept: $kept2")
      // Index holds retained clips' bands only: 1, 3, 7 banded 4 each
      // (4 and 5 banded nothing — null hash), duplicate-free.
      val bands = spark.read.parquet(s"$dir/index").collect().map(_.getString(0))
      assert(bands.length == 12 && bands.distinct.length == 12,
        s"index bands: ${bands.length} (${bands.distinct.length} distinct)")
    } finally q.stop()
  }

  test("audioNearDupScreenBatch: replaying a batch id is idempotent and bands match the batch dedup path") {
    import graft.ops.MediaCodec
    def wav(seed: Long, n: Int): Array[Byte] =
      MediaCodec.encodeWavPcm16(16000, Array.tabulate(n)(i =>
        Math.floorMod(seed * 37 + i.toLong * 97, 2001L).toInt - 1000))
    val dir = Files.createTempDirectory("graft-auddup-replay").toString
    val b0 = Seq((1L, wav(5L, 320), ts(0)), (2L, wav(5L, 320), ts(1)))
      .toDF("asset_id", "content", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.audioNearDupScreenBatch(df, s"$dir/index", batchId,
        "asset_id", "content", "ts").select("asset_id")
        .collect().map(_.getLong(0)).toSet
    assert(run(0L, b0) == Set(1L))
    // Replay (foreachBatch at-least-once): the rerun must see the
    // pre-batch index state — clip 1 survives again instead of
    // colliding with its own bands, and the index has no duplicates.
    assert(run(0L, b0) == Set(1L))
    val bandsAfterReplay = spark.read.parquet(s"$dir/index")
      .select("band").collect().map(_.getString(0))
    assert(bandsAfterReplay.length == 4 &&
      bandsAfterReplay.distinct.length == 4, s"index: ${bandsAfterReplay.toSeq}")
    // Band-derivation parity with the BATCH near-dup machinery: the
    // gate's persisted band keys are exactly fingerprintBandKeys over
    // audioHash63 — stream and batch band identically, so a clip the
    // gate screens is one fingerprintPairs would have paired.
    val expected = MediaCodec.decodeWav(wav(5L, 320))
      .flatMap(MediaCodec.audioHash63).map { h =>
        (0 until 4).map(b => s"$b|${(h >>> (b * 16)) & 0xFFFFL}").toSet
      }.get
    assert(bandsAfterReplay.toSet == expected,
      s"gate bands ${bandsAfterReplay.toSet} != batch-path bands $expected")
  }

  private def semModel = graft.index.IvfIndex.Model(IndexedSeq(
    IndexedSeq(1.0, 0.0, 0.0, 0.0), IndexedSeq(0.0, 1.0, 0.0, 0.0)))

  test("semNearDupIngestStream: semantic gate drops near-dups within and across batches, passes null vectors") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double], Timestamp)]
    val dir = Files.createTempDirectory("graft-semgate").toString
    val q = StreamingOps.semNearDupIngestStream(
      input.toDF().toDF("id", "vec", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt",
      semModel, threshold = 0.9)
    try {
      // Batch 1: doc 2 is cosine ~0.995 to doc 1 (same cluster) ->
      // in-batch drop, first arrival keeps 1; doc 3 lives in the other
      // cluster; doc 4 has NO vector -> no evidence, passes.
      input.addData(
        (1L, Seq(1.0, 0.0, 0.0, 0.0), ts(0)),
        (2L, Seq(0.99, 0.1, 0.0, 0.0), ts(1)),
        (3L, Seq(0.0, 1.0, 0.0, 0.0), ts(2)),
        (4L, null, ts(3)))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept1 == Set(1L, 3L, 4L), s"batch 1 kept: $kept1")
      // Batch 2: doc 6 replays doc 1's vector -> cross-batch drop
      // against the survivors index; doc 7 is near doc 3 -> cross
      // drop; doc 8 is orthogonal to everything retained -> kept
      // (it ties into cluster 0 by the lowest-index rule, where its
      // cosine to doc 1 is 0).
      input.addData(
        (6L, Seq(1.0, 0.0, 0.0, 0.0), ts(10)),
        (7L, Seq(0.0, 0.98, 0.2, 0.0), ts(11)),
        (8L, Seq(0.0, 0.0, 0.0, 1.0), ts(12)))
      q.processAllAvailable()
      val kept2 = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(1L, 3L, 4L, 8L), s"after batch 2 kept: $kept2")
      // Index holds survivors' rows only (docs 1, 3, 8 — doc 4 had no
      // vector, hence no index row), with the int8 screen payload.
      val idx = spark.read.parquet(s"$dir/index")
      assert(idx.count() == 3L, s"index rows: ${idx.count()}")
      assert(idx.columns.toSet ==
        Set("cluster", "vec", "q", "ua", "nrm", "sq", "batch"),
        s"index columns: ${idx.columns.toSet}")
    } finally q.stop()
  }

  test("semNearDupScreenBatch: replay idempotent; decisions match SemDedup.flag; compaction is layout-only") {
    val dir = Files.createTempDirectory("graft-semgate-replay").toString
    val twin = Files.createTempDirectory("graft-semgate-twin").toString
    val rnd = new scala.util.Random(31)
    // Duplicate-rich corpus: base directions plus jittered copies.
    def jitter(v: Seq[Double]) = v.map(_ + (rnd.nextDouble() - 0.5) * 0.02)
    val base = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.7, 0.7, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val rows = (0 until 24).map { i =>
      (i.toLong, jitter(base(i % base.length)), ts(i))
    }
    val b0 = rows.take(12).toDF("id", "vec", "ts")
    val b1 = rows.drop(12).toDF("id", "vec", "ts")
    def run(idx: String, batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.semNearDupScreenBatch(df, idx, batchId,
        "id", "vec", "ts", semModel, threshold = 0.98)
        .select("id").collect().map(_.getLong(0)).toSet
    val kept0 = run(dir, 0L, b0)
    // Replay of batch 0 sees the pre-batch state: same survivors, no
    // index duplication.
    assert(run(dir, 0L, b0) == kept0, "replay must be idempotent")
    val idxRows = spark.read.parquet(dir).count()
    assert(idxRows == kept0.size.toLong, s"index rows $idxRows != ${kept0.size}")
    // Decision parity with the batch-mode SemDedup on one batch: with
    // ts = arrival = id order, the gate's first-arrival rule IS
    // flag()'s min-id survivor rule (both sides pair against ALL rows,
    // not survivors — the same documented transitive over-drop).
    val flagged = graft.ops.SemDedup.flag(b0, "id", "vec", semModel,
        threshold = 0.98)
      .where(col("is_dup") === 0).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept0 == flagged, s"gate $kept0 != SemDedup.flag $flagged")
    // Cross-batch decisions are invariant under compactSemIndex: twin
    // index runs the same batches with a compaction in between.
    assert(run(twin, 0L, b0) == kept0)
    StreamingOps.compactSemIndex(spark, twin, upToBatch = 0L)
    val k1 = run(dir, 1L, b1)
    val k1Twin = run(twin, 1L, b1)
    assert(k1 == k1Twin, s"compaction changed decisions: $k1 vs $k1Twin")
    // And the compacted twin refuses a replay at/below its mark.
    intercept[IllegalStateException] { run(twin, 0L, b0) }
  }

  test("nearDupScreenBatch: replaying a batch id is idempotent (no self-collision, no index dup)") {
    val dir = Files.createTempDirectory("graft-neardup-replay").toString
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
      (2L, "the quick brown fox jumps over the lazy dog", ts(1)))
      .toDF("id", "text", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, s"$dir/index", batchId,
        "id", "text", "ts").select("id").collect().map(_.getLong(0)).toSet
    assert(run(0L, b0) == Set(1L))
    // Replay of batch 0 (foreachBatch at-least-once): the rerun must
    // see the pre-batch index state — doc 1 survives again instead of
    // colliding with its own bands, and the index has no duplicates.
    assert(run(0L, b0) == Set(1L))
    val bandsAfterReplay = spark.read.parquet(s"$dir/index")
      .select("band").collect().map(_.getString(0))
    assert(bandsAfterReplay.length == 4 &&
      bandsAfterReplay.distinct.length == 4, s"index: ${bandsAfterReplay.toSeq}")
    // A later batch still screens against batch 0's retained bands.
    val b1 = Seq((7L, "the quick brown fox jumps over the lazy dog", ts(9)))
      .toDF("id", "text", "ts")
    assert(run(1L, b1) == Set.empty[Long])
    // Drop-scratch retention: only the CURRENT batch's _drops dir may
    // remain (older dirs are dead once their own call returned — a
    // long-lived stream must not accumulate one dir per micro-batch).
    val dropDirs = Option(new java.io.File(s"$dir/index/_drops").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(!dropDirs.contains("batch=0"), s"stale drop scratch kept: $dropDirs")
  }

  test("compactBandIndex: decisions identical pre/post compaction; replay rules enforced") {
    // Twin indexes fed the same three batches; index B is compacted
    // between batches — every gate decision must be identical, because
    // compaction changes the index's LAYOUT (one blob + few dirs), not
    // its content.
    val dirA = Files.createTempDirectory("graft-compact-a").toString
    val dirB = Files.createTempDirectory("graft-compact-b").toString
    def batchDf(rows: (Long, String, Int)*) =
      rows.map { case (id, t, m) => (id, t, ts(m)) }.toDF("id", "text", "ts")
    val b0 = batchDf((1L, "the quick brown fox jumps over the lazy dog", 0),
      (2L, "completely different text about spark streaming engines and state", 1))
    val b1 = batchDf((3L, "another unrelated document mentioning catalysts and codegen", 2))
    val b2 = batchDf(
      (4L, "the quick brown fox jumps over the lazy dog", 3),   // dups batch 0 (pre-compaction state)
      (5L, "another unrelated document mentioning catalysts and codegen", 4), // dups batch 1
      (6L, "fresh content that matches nothing else in this fixture at all", 5))
    def run(idx: String, batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, idx, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    assert(run(dirA, 0L, b0) == run(dirB, 0L, b0))
    assert(run(dirA, 1L, b1) == run(dirB, 1L, b1))
    StreamingOps.compactBandIndex(spark, dirB, upToBatch = 1L)
    // Per-batch dirs merged and swept; the blob + marker published.
    val names = Option(new java.io.File(dirB).listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(!names.contains("batch=0") && !names.contains("batch=1") &&
      names.contains("_compact"), s"index layout after compact: $names")
    // Batch 2 screens identically against the compacted index — both
    // the cross-batch drops (4 against batch 0's bands, 5 against
    // batch 1's) and the survivor.
    val keptA = run(dirA, 2L, b2)
    val keptB = run(dirB, 2L, b2)
    assert(keptA == Set(6L) && keptB == keptA,
      s"post-compaction divergence: A=$keptA B=$keptB")
    // Replay ABOVE the mark stays idempotent (batch 2 re-delivered).
    assert(run(dirB, 2L, b2) == keptB)
    // Replay AT/BELOW the mark is loudly refused — its strictly-earlier
    // state is no longer reconstructible.
    intercept[IllegalStateException] { run(dirB, 1L, b1) }
    intercept[IllegalStateException] { run(dirB, 0L, b0) }
  }

  test("nearDupIngestStream with compactEvery: decisions unchanged, index stays folded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val dir = Files.createTempDirectory("graft-autocompact").toString
    val q = StreamingOps.nearDupIngestStream(
      input.toDF().toDF("id", "text", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt", compactEvery = 1)
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2L, "completely different text about spark streaming engines", ts(1)))
      q.processAllAvailable()
      input.addData(
        (3L, "another unrelated document mentioning catalysts and codegen", ts(2)))
      q.processAllAvailable()
      // Batch 2 (trigger fires: 2 % 1 == 0 after its own write):
      // doc 4 must still drop against batch 0's bands — which by now
      // live in the compacted blob, not a batch dir.
      input.addData(
        (4L, "the quick brown fox jumps over the lazy dog", ts(3)),
        (5L, "fresh content that matches nothing else in this fixture", ts(4)))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 3L, 5L), s"kept: $kept")
      // The index is folded: at most the LAST batch's dir remains
      // (batch 2's own dir — its trigger marked batchId-1 = 1), plus
      // the blob.
      val names = Option(new java.io.File(s"$dir/index").listFiles())
        .map(_.map(_.getName).filter(_.startsWith("batch=")).toSet)
        .getOrElse(Set.empty)
      assert(names.subsetOf(Set("batch=2")), s"unfolded batch dirs: $names")
      assert(new java.io.File(s"$dir/index/_compact").exists())
    } finally q.stop()
  }

  test("compactBandIndex: second compaction folds the blob forward; stale dirs are ignored") {
    val dir = Files.createTempDirectory("graft-compact-2").toString
    def batchDf(rows: (Long, String, Int)*) =
      rows.map { case (id, t, m) => (id, t, ts(m)) }.toDF("id", "text", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, dir, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    run(0L, batchDf((1L, "the quick brown fox jumps over the lazy dog", 0)))
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 0L)
    run(1L, batchDf((2L, "completely different text about spark streaming engines", 1)))
    // Crash-window simulation: a merged dir that step (3) failed to
    // sweep must be IGNORED by both the gate read (batch <= hwm
    // excluded) and the next compaction's source (already in the
    // blob) — duplicate bands would be harmless, but the contract is
    // they are not even read.
    val stale = new java.io.File(s"$dir/batch=0")
    stale.mkdirs()
    java.nio.file.Files.write(stale.toPath.resolve("_SUCCESS"), Array.empty[Byte])
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 1L)
    // New blob version and marker live; the PREVIOUS version survives
    // one cycle (grace, r16 ADVICE: a gate that resolved hwm_0 just
    // before this publish keeps the v=0 blob it planned to scan).
    val compactNames = Option(new java.io.File(s"$dir/_compact").listFiles())
      .map(_.map(_.getName).filterNot(_.startsWith(".")).toSet)
      .getOrElse(Set.empty)
    assert(compactNames.contains("hwm_1") &&
      compactNames.contains("hwm_0") && compactNames.contains("v=0"),
      s"compact dir after second pass: $compactNames")
    // Both original docs' bands still screen: replays of their text drop.
    val kept = run(2L, batchDf(
      (7L, "the quick brown fox jumps over the lazy dog", 9),
      (8L, "completely different text about spark streaming engines", 10),
      (9L, "genuinely new text that shares no shingles with anything", 11)))
    assert(kept == Set(9L), s"after second compaction kept: $kept")
    // A THIRD compaction reclaims the version-0 grace garbage: only
    // versions 2 and 1 remain afterwards.
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 2L)
    val afterThird = Option(new java.io.File(s"$dir/_compact").listFiles())
      .map(_.map(_.getName).filterNot(_.startsWith(".")).toSet)
      .getOrElse(Set.empty)
    assert(!afterThird.contains("hwm_0") && !afterThird.contains("v=0") &&
      afterThird.contains("hwm_2"),
      s"compact dir after third pass: $afterThird")
    // And the fully-folded index still screens everything it ever kept.
    val kept3 = run(3L, batchDf(
      (10L, "genuinely new text that shares no shingles with anything", 12),
      (11L, "a sentence this index has never seen in any batch before", 13)))
    assert(kept3 == Set(11L), s"after third compaction kept: $kept3")
  }

  test("compactBandIndex: an over-advanced mark is CLAMPED to the dirs that exist") {
    // An operator cron-compacting an idle index with a generous mark
    // (upToBatch = 5 when only batch 0 ever ran): pre-clamp, the
    // published hwm jumped to 5 and the FIRST delivery of batches 1-5
    // would throw the replay guard — the stream permanently wedged
    // until manual marker surgery (r16 ADVICE). The mark now clamps to
    // max(highest existing dir id, current hwm): marks above the max
    // dir buy nothing, so the idle advance is a silent no-op.
    val dir = Files.createTempDirectory("graft-compact-idle").toString
    val b0 = Seq((1L, "the quick brown fox jumps over the lazy dog", ts(0)))
      .toDF("id", "text", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, dir, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    run(0L, b0)
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 0L)
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 5L) // idle advance: no-op
    // Dot-prefixed names (local-FS .crc sidecars, tmp files) are
    // reader-invisible — filter them like the readers do.
    val compactNames = Option(new java.io.File(s"$dir/_compact").listFiles())
      .map(_.map(_.getName).filterNot(_.startsWith(".")).toSet)
      .getOrElse(Set.empty)
    assert(compactNames == Set("hwm_0", "v=0"),
      s"after clamped idle advance: $compactNames")
    // THE un-wedging this clamp exists for: batch 1's first delivery
    // (id <= the naive mark of 5) screens normally instead of hitting
    // the replay guard, and cross-batch drops against the blob hold.
    val b1 = Seq(
      (8L, "the quick brown fox jumps over the lazy dog", ts(8)),   // dups blob
      (9L, "a wholly new sentence with no shared shingles anywhere", ts(9)))
      .toDF("id", "text", "ts")
    assert(run(1L, b1) == Set(9L), "batch 1 must screen, not wedge")
    // Replay at/below the REAL mark stays refused.
    intercept[IllegalStateException] { run(0L, b0) }
  }

  test("leveled compaction: routine triggers write L0 sub-blobs; consolidation bounds the count; promote folds into L1") {
    // The r16 verdict #1 shape: a routine trigger must write ONLY the
    // just-folded dirs' bands (an l0= sub-blob), never rewrite L1; the
    // sub-blob count stays bounded by maxL0 via consolidation; and a
    // promote merges everything into one new L1. Decisions are pinned
    // by the uncompacted twin at every step.
    val dir = Files.createTempDirectory("graft-leveled").toString
    val twin = Files.createTempDirectory("graft-leveled-twin").toString
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog",
      "completely different text about spark streaming engines and state",
      "another unrelated document mentioning catalysts and codegen",
      "fresh content that matches nothing else in this fixture at all",
      "a fifth distinct sentence with its own vocabulary entirely",
      "sixth unique sentence carrying yet more distinct shingle mass",
      "seventh fixture sentence introducing brand new shingle material")
    def run(idx: String, batchId: Long, rows: Seq[(Long, String)]) =
      StreamingOps.nearDupScreenBatch(
        rows.map { case (id, t) => (id, t, ts(id.toInt)) }.toDF("id", "text", "ts"),
        idx, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    def both(batchId: Long, rows: Seq[(Long, String)]): Set[Long] = {
      val a = run(dir, batchId, rows)
      val b = run(twin, batchId, rows)
      assert(a == b, s"batch $batchId diverged: leveled=$a twin=$b")
      a
    }
    def names(): Set[String] =
      Option(new java.io.File(s"$dir/_compact").listFiles())
        .map(_.map(_.getName).filterNot(_.startsWith(".")).toSet)
        .getOrElse(Set.empty)
    val noL1 = 1e9 // fraction high enough that nothing ever promotes
    both(0L, Seq(1L -> pool(0), 2L -> pool(1)))
    StreamingOps.compactBandIndex(spark, dir, 0L, l0Fraction = noL1, maxL0 = 2)
    assert(names().contains("v=0"), s"first compaction must create L1: ${names()}")
    both(1L, Seq(3L -> pool(2), 4L -> pool(0))) // 4 dups L1 content
    StreamingOps.compactBandIndex(spark, dir, 1L, l0Fraction = noL1, maxL0 = 2)
    assert(names().contains("l0=1") && names().contains("v=0") &&
      !names().contains("v=1"),
      s"routine trigger must fold into an L0 sub-blob, not rewrite L1: ${names()}")
    both(2L, Seq(5L -> pool(3), 6L -> pool(2))) // 6 dups the l0=1 sub-blob
    StreamingOps.compactBandIndex(spark, dir, 2L, l0Fraction = noL1, maxL0 = 2)
    assert(names().contains("l0=2") && names().contains("l0=1"),
      s"second routine fold appends a sub-blob: ${names()}")
    // Third fold would make 3 sub-blobs > maxL0=2: consolidation merges
    // all of L0 (plus the new dirs) into ONE sub-blob, L1 untouched.
    both(3L, Seq(7L -> pool(4)))
    StreamingOps.compactBandIndex(spark, dir, 3L, l0Fraction = noL1, maxL0 = 2)
    assert(names().contains("l0=3") && names().contains("v=0"),
      s"consolidation must produce one fresh sub-blob: ${names()}")
    // Grace: the swept sub-blobs survive exactly one more cycle.
    assert(names().contains("l0=1") && names().contains("l0=2"),
      s"pre-consolidation sub-blobs keep one grace cycle: ${names()}")
    both(4L, Seq(8L -> pool(5)))
    StreamingOps.compactBandIndex(spark, dir, 4L, l0Fraction = noL1, maxL0 = 2)
    assert(!names().contains("l0=1") && !names().contains("l0=2"),
      s"grace expired — consolidated-away sub-blobs reclaimed: ${names()}")
    // Promote (l0Fraction = 0 forces it): everything folds into a new
    // L1; the L0 list empties.
    both(5L, Seq(9L -> pool(6)))
    StreamingOps.compactBandIndex(spark, dir, 5L, l0Fraction = 0.0, maxL0 = 2)
    assert(names().contains("v=5"), s"promote must write a new L1: ${names()}")
    // Every retained text still screens post-promote; fresh text passes.
    val kept = both(6L, Seq(
      20L -> pool(0), 21L -> pool(2), 22L -> pool(4), 23L -> pool(6),
      24L -> "an entirely novel closing sentence unseen by either index"))
    assert(kept == Set(24L), s"post-promote decisions: $kept")
  }

  test("compactState: a legacy bare-number marker (pre-leveled format) stays readable") {
    val dir = Files.createTempDirectory("graft-legacy-marker").toString
    val b0 = Seq((1L, "the quick brown fox jumps over the lazy dog", ts(0)))
      .toDF("id", "text", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, dir, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    run(0L, b0)
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 0L)
    // Rewrite the marker to the r16 monolithic format: bare hwm, no
    // blob fields — the blob version is implicitly the marker's own.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_compact/hwm_0"), "0\n".getBytes("UTF-8"))
    // The direct rewrite bypassed Hadoop's checksum layer — drop the
    // stale .crc sidecar or every read of the marker fails checksum.
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_compact/.hwm_0.crc"))
    // Legacy read: the gate must resolve blob v=0 through the bare
    // marker — the dup drops, and a replay below the mark is refused.
    val b1 = Seq(
      (7L, "the quick brown fox jumps over the lazy dog", ts(7)),
      (8L, "a different sentence that matches nothing in the index", ts(8)))
      .toDF("id", "text", "ts")
    assert(run(1L, b1) == Set(8L), "legacy marker must still screen")
    intercept[IllegalStateException] { run(0L, b0) }
    // And the next compaction upgrades in place: new-format marker,
    // old blob retained for the grace cycle, decisions intact.
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 1L)
    val b2 = Seq(
      (9L, "a different sentence that matches nothing in the index", ts(9)),
      (10L, "yet another brand new sentence for the closing batch", ts(10)))
      .toDF("id", "text", "ts")
    assert(run(2L, b2) == Set(10L), "post-upgrade decisions must hold")
  }

  test("compaction crash windows: orphan blobs and tmp markers are ignored and reclaimed") {
    // A crash between step (1) blob write and step (2) marker publish
    // leaves a blob no marker references; a crash mid-publish leaves a
    // .tmp marker. Readers must ignore both (markers only, published
    // names only) and the next compaction's sweep must reclaim them.
    val dir = Files.createTempDirectory("graft-compact-orphan").toString
    def batchDf(rows: (Long, String, Int)*) =
      rows.map { case (id, t, m) => (id, t, ts(m)) }.toDF("id", "text", "ts")
    def run(batchId: Long, df: org.apache.spark.sql.DataFrame) =
      StreamingOps.nearDupScreenBatch(df, dir, batchId, "id", "text", "ts")
        .select("id").collect().map(_.getLong(0)).toSet
    run(0L, batchDf((1L, "the quick brown fox jumps over the lazy dog", 0)))
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 0L)
    // Crash leftovers: an unpublished L0 blob and a torn tmp marker.
    val orphan = new java.io.File(s"$dir/_compact/l0=99")
    orphan.mkdirs()
    java.nio.file.Files.write(orphan.toPath.resolve("_SUCCESS"), Array.empty[Byte])
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_compact/.hwm_99.tmp"),
      "torn".getBytes("UTF-8"))
    // The gate resolves published state only: the dup still drops, the
    // fresh doc passes, nothing throws on the torn marker.
    val kept = run(1L, batchDf(
      (7L, "the quick brown fox jumps over the lazy dog", 7),
      (8L, "a brand new sentence sharing nothing with the corpus", 8)))
    assert(kept == Set(8L), s"kept under orphans: $kept")
    // The next compaction sweeps both orphans.
    StreamingOps.compactBandIndex(spark, dir, upToBatch = 1L)
    val names = Option(new java.io.File(s"$dir/_compact").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(!names.contains("l0=99") && !names.exists(_.endsWith(".tmp")),
      s"orphans not reclaimed: $names")
  }

  test("semNearDupIngestStream with compactEvery: decisions unchanged, index folds under the sem schema") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double], Timestamp)]
    val dir = Files.createTempDirectory("graft-semcompact").toString
    val q = StreamingOps.semNearDupIngestStream(
      input.toDF().toDF("id", "vec", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt",
      semModel, threshold = 0.9, compactEvery = 1)
    try {
      input.addData(
        (1L, Seq(1.0, 0.0, 0.0, 0.0), ts(0)),
        (2L, Seq(0.0, 1.0, 0.0, 0.0), ts(1)))
      q.processAllAvailable()
      input.addData((3L, Seq(0.0, 0.0, 1.0, 0.0), ts(2)))
      q.processAllAvailable()
      // Batch 2 (trigger fired after batch 1 wrote, mark = 0): doc 4
      // must still drop against batch 0's survivor — whose index row
      // now lives in the compacted blob under the SEM schema.
      input.addData(
        (4L, Seq(0.99, 0.05, 0.0, 0.0), ts(3)),
        (5L, Seq(0.0, 0.0, 0.0, 1.0), ts(4)))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 3L, 5L), s"kept: $kept")
      assert(new java.io.File(s"$dir/index/_compact").exists(),
        "sem index must have compacted state")
      val dirs = Option(new java.io.File(s"$dir/index").listFiles())
        .map(_.map(_.getName).filter(_.startsWith("batch=")).toSet)
        .getOrElse(Set.empty)
      assert(dirs.subsetOf(Set("batch=1", "batch=2")),
        s"unfolded sem batch dirs: $dirs")
    } finally q.stop()
  }

  test("property: compaction at any mark preserves every gate decision (randomized batches)") {
    // Randomized deepening of the twin-index pin: 3 trials of 3
    // batches drawn (with repetition) from a duplicate-rich pool; the
    // compacted twin folds its index after a random batch. Survivors
    // must match per batch — compaction may change index LAYOUT only.
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog",
      "completely different text about spark streaming engines and state",
      "another unrelated document mentioning catalysts and codegen",
      "fresh content that matches nothing else in this fixture at all",
      "a fifth distinct sentence with its own vocabulary entirely",
      "tiny", // shingle-less: no evidence, always passes
      "the quick brown fox jumps over the lazy dog", // pool-level dup
      "sixth unique sentence carrying yet more distinct shingle mass")
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val plain = Files.createTempDirectory(s"graft-prop-a$trial").toString
      val folded = Files.createTempDirectory(s"graft-prop-b$trial").toString
      val compactAfter = rnd.nextInt(2) // fold after batch 0 or 1
      var nextId = 0L
      for (batchId <- 0L to 2L) {
        val rows = (0 until 6).map { _ =>
          nextId += 1
          (nextId, pool(rnd.nextInt(pool.length)), ts(nextId.toInt))
        }.toDF("id", "text", "ts")
        def run(idx: String) =
          StreamingOps.nearDupScreenBatch(rows, idx, batchId, "id", "text", "ts")
            .select("id").collect().map(_.getLong(0)).toSet
        val a = run(plain)
        val b = run(folded)
        assert(a == b,
          s"trial $trial batch $batchId diverged (compactAfter=$compactAfter): plain=$a folded=$b")
        // Randomize the LEVELED knobs too: 0 = always promote (the
        // monolithic shape), 0.25 = the default, 1e9 = never promote
        // (pure L0 folds); maxL0 = 1 forces consolidation every
        // trigger. Decisions must be invariant to all of it.
        if (batchId == compactAfter)
          StreamingOps.compactBandIndex(spark, folded, upToBatch = batchId,
            l0Fraction = Seq(0.0, 0.25, 1e9)(rnd.nextInt(3)),
            maxL0 = Seq(1, 2, 16)(rnd.nextInt(3)))
      }
    }
  }

  test("ingestStream maintains the Bloom prescreen and metadata_hash across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Map[String, String])]
    val dir = Files.createTempDirectory("graft-stream-int").toString
    val store = DocumentStore.fromTexts(spark, s"$dir/store",
      Seq("seed doc"), Nil, StoreConfig(), HashEmbedder(16))
    val q = StreamingOps.ingestStream(
      input.toDF().toDF("text", "metadata"), store, s"$dir/ckpt")
    try {
      input.addData(("alpha", Map("source" -> "s1", "k" -> "v")),
        ("beta", Map.empty[String, String]))
      q.processAllAvailable()
      // A later batch replaying an earlier batch's text must dedup
      // against the STORE (Bloom prescreen + confirm anti-join), not
      // just within its own batch.
      input.addData(("alpha", Map("source" -> "other")), ("gamma", Map.empty[String, String]))
      q.processAllAvailable()
      assert(store.documentCount == 4) // seed, alpha, beta, gamma
      // Streamed appends carry the SAME canonical metadata_hash the
      // batch path writes: the full-outer integrity audit sees every
      // row ok — no mismatch/missing/orphan from the streaming surface.
      val statuses = store.verifyIntegrity()
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(statuses == Map("ok" -> 4L), s"integrity after stream: $statuses")
    } finally q.stop()
  }

  test("cdcApplyStream: micro-batches merge into a versioned table; readers see complete snapshots") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Int, String)]
    val dir = Files.createTempDirectory("graft-cdc").toString
    val q = StreamingOps.cdcApplyStream(
      input.toDF().toDF("k", "name", "v", "op"),
      s"$dir/table", Seq("k"), s"$dir/ckpt")
    try {
      // batch 0 bootstraps from inserts
      input.addData((1L, "one", 10, "insert"), (2L, "two", 20, "insert"))
      q.processAllAvailable()
      val t0 = StreamingOps.cdcTable(spark, s"$dir/table").get.collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("name")).toMap
      assert(t0 == Map(1L -> "one", 2L -> "two"))
      // batch 1: update, delete, insert
      input.addData((1L, "one-v2", 11, "update"), (2L, "", 0, "delete"),
        (3L, "three", 30, "insert"))
      q.processAllAvailable()
      val t1 = StreamingOps.cdcTable(spark, s"$dir/table").get.collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("name"), r.getAs[Int]("v")))).toMap
      assert(t1 == Map(1L -> (("one-v2", 11)), 3L -> (("three", 30))))
      // both snapshot versions exist (copy-on-write, readers unbroken)
      assert(new java.io.File(s"$dir/table/v0").isDirectory)
      assert(new java.io.File(s"$dir/table/v1").isDirectory)
      // reader survives a missing pointer (mid-swap window): falls back
      // to the highest complete version dir
      assert(new java.io.File(s"$dir/table/LATEST").delete())
      val viaFallback = StreamingOps.cdcTable(spark, s"$dir/table").get
        .collect().map(_.getAs[Long]("k")).toSet
      assert(viaFallback == Set(1L, 3L))
    } finally q.stop()
  }

  test("cdcApplyStream with orderCols compacts multi-change batches (insert+delete nets to deleted)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Int, String, Long)]
    val dir = Files.createTempDirectory("graft-cdc2").toString
    val q = StreamingOps.cdcApplyStream(
      input.toDF().toDF("k", "name", "v", "op", "seq"),
      s"$dir/table", Seq("k"), s"$dir/ckpt", orderCols = Seq("seq"))
    try {
      // one batch: k=1 inserted then deleted (seq order); k=2 updated twice
      input.addData(
        (1L, "one", 10, "insert", 1L), (1L, "", 0, "delete", 2L),
        (2L, "two-v1", 20, "insert", 3L), (2L, "two-v2", 21, "update", 4L))
      q.processAllAvailable()
      val t = StreamingOps.cdcTable(spark, s"$dir/table").get.collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("name")).toMap
      assert(t == Map(2L -> "two-v2"), s"got $t") // k=1 net-deleted, no dup k=2
    } finally q.stop()
  }

  test("hourlyEventCounts: watermarked windowed agg over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.hourlyEventCounts(
      input.toDF().toDF("ts", "event_type", "value"), "ts")
    val q = agg.writeStream.format("memory").queryName("hourly_test")
      .outputMode("update").start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(70), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("event_type", "n", "total_value").collect()
      val byType = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(byType("click") == (2L, 3.0))
      assert(byType("view") == (1L, 5.0))
    } finally q.stop()
  }

  test("hopping windows: each event counted in width/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.hourlyEventCounts(
      input.toDF().toDF("ts", "event_type", "value"), "ts",
      width = "1 hour", slide = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("hopping_test")
      .outputMode("update").start()
    try {
      input.addData((ts(40), "click", 1.0)) // minute 40: windows [0,60) and [30,90)
      q.processAllAvailable()
      val wins = spark.table("hopping_test")
        .selectExpr("window.start", "n").collect()
      assert(wins.length == 2)
      assert(wins.forall(_.getLong(1) == 1L))
    } finally q.stop()
  }

  test("hourlyEventCounts append mode: windows emit on watermark passage, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.hourlyEventCounts(
      input.toDF().toDF("ts", "event_type", "value"), "ts", watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      // window [0h,1h): two clicks.
      input.addData((ts(0), "click", 1.0), (ts(30), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("hourly_append").isEmpty) // watermark hasn't passed 1h yet
      // event at +3h advances watermark to +2h -> [0h,1h) closes and emits.
      input.addData((ts(180), "view", 5.0))
      q.processAllAvailable()
      val closed = spark.table("hourly_append")
        .select("event_type", "n", "total_value").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(closed == Map("click" -> (2L, 3.0)))
      // a late click at +0h10m is behind the watermark -> dropped, no new emit for that window.
      input.addData((ts(10), "click", 100.0))
      q.processAllAvailable()
      val after = spark.table("hourly_append")
        .where($"event_type" === "click").collect()
      assert(after.length == 1 && after.head.getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("sessionWindowAgg: native session_window merges gap sessions, emits on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = StreamingOps.sessionWindowAgg(
      input.toDF().toDF("user_id", "ts", "value"), "ts",
      gap = "30 minutes", watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("sess_native")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min
      // gap -> a second session. user 2: one event.
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 4.0),
        (2L, ts(5), 8.0))
      q.processAllAvailable()
      assert(spark.table("sess_native").isEmpty) // nothing closed yet
      // +5h advances the watermark far past every session's end
      input.addData((9L, ts(300), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_native")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("dedupStream: null-text rows each pass through, never merged as one key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dd = StreamingOps.dedupStream(
      input.toDF().toDF("ts", "text"), "text", "ts", watermark = "1 hour")
    val q = dd.writeStream.format("memory").queryName("dedup_null_stream")
      .outputMode("append").start()
    try {
      // fingerprint(null) is null and the state store groups null keys
      // as EQUAL — without the surrogate key the second null-text row
      // would be silently swallowed as a "duplicate".
      input.addData((ts(0), null), (ts(1), null),
        (ts(2), "real text"), (ts(3), "real text"))
      q.processAllAvailable()
      val out = spark.table("dedup_null_stream")
      assert(out.where($"text".isNull).count() == 2)
      assert(out.where($"text" === "real text").count() == 1)
    } finally q.stop()
  }

  test("cdcApplyStream retention keeps keepVersions snapshots BEHIND the pointer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Int, String)]
    val dir = Files.createTempDirectory("graft-cdc-ret").toString
    val q = StreamingOps.cdcApplyStream(
      input.toDF().toDF("k", "name", "v", "op"),
      s"$dir/table", Seq("k"), s"$dir/ckpt", keepVersions = 1)
    try {
      for (i <- 0 to 2) {
        input.addData((i.toLong, s"row$i", i, "insert"))
        q.processAllAvailable()
      }
      // After v2 lands with keepVersions=1: v1 is the reader-grace
      // snapshot and must SURVIVE (an inclusive sweep bound deleted it,
      // yanking the just-replaced version from under readers); v0 is
      // past the grace window and must be gone.
      assert(!new java.io.File(s"$dir/table/v0").exists())
      assert(new java.io.File(s"$dir/table/v1").isDirectory)
      assert(new java.io.File(s"$dir/table/v2").isDirectory)
    } finally q.stop()
  }

  test("a (re)started stream full-sweeps versions leaked beyond the bounded window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Int, String)]
    val dir = Files.createTempDirectory("graft-cdc-leak").toString
    // A table with a long history whose sweeps were missed: pointer at
    // v12, live snapshot v12, and stale v0/v1/v3 leaked BELOW the
    // steady-state probe window (which only reaches 8 versions back).
    val snap = Seq((1L, "old", 0)).toDF("k", "name", "v")
    for (ver <- Seq(0, 1, 3, 12)) snap.write.parquet(s"$dir/table/v$ver")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/table/LATEST"),
      "12".getBytes("UTF-8"))
    val q = StreamingOps.cdcApplyStream(
      input.toDF().toDF("k", "name", "v", "op"),
      s"$dir/table", Seq("k"), s"$dir/ckpt", keepVersions = 1)
    try {
      input.addData((2L, "new", 2, "insert"))
      q.processAllAvailable()
      // First batch after the (re)start full-sweeps everything below
      // the cutoff (v13 − keepVersions = v12), including versions the
      // bounded per-batch window could never reach.
      for (ver <- Seq(0, 1, 3))
        assert(!new java.io.File(s"$dir/table/v$ver").exists(), s"v$ver leaked")
      assert(new java.io.File(s"$dir/table/v12").isDirectory) // reader grace
      assert(new java.io.File(s"$dir/table/v13").isDirectory)
    } finally q.stop()
  }

  test("dedupStream drops watermark-horizon duplicates across micro-batches, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dd = StreamingOps.dedupStream(
      input.toDF().toDF("ts", "text"), "text", "ts", watermark = "1 hour")
    val q = dd.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts + one exact dup + one case/space dup
      input.addData((ts(0), "Hello World"), (ts(1), "other text"),
        (ts(2), "Hello World"), (ts(3), "  hello   WORLD "))
      q.processAllAvailable()
      // batch 2: a duplicate arriving within the watermark horizon -> dropped
      input.addData((ts(20), "Hello World"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("text").collect()
        .map(_.getString(0)).toSeq
      assert(kept.sorted == Seq("Hello World", "other text"))
      // advance the watermark far past the first keys, then re-send:
      // state has been evicted, so the key is treated as NEW (documented
      // bounded-state trade-off).
      input.addData((ts(600), "advance watermark"))
      q.processAllAvailable()
      input.addData((ts(610), "Hello World"))
      q.processAllAvailable()
      val again = spark.table("dedup_stream")
        .where($"text" === "Hello World").count()
      assert(again == 2L)
    } finally q.stop()
  }

  test("intervalJoinStream: purchases join same-user clicks within lookback; state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.intervalJoinStream(
      buys.toDF().toDF("user_id", "bts", "amount"),
      clicks.toDF().toDF("user_id", "cts", "page"),
      "user_id", "bts", "cts", lookback = "30 minutes", watermark = "1 hour")
      .select(col("l.user_id"), col("amount"), col("page"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("ivj_test")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), "home"), (1L, ts(10), "product"),
        (2L, ts(5), "home"))
      buys.addData((1L, ts(20), 9.99))
      q.processAllAvailable()
      // advance BOTH watermarks so eligible matches emit in append mode
      clicks.addData((9L, ts(300), "x"))
      buys.addData((9L, ts(300), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ivj_test")
        .where($"amount" === 9.99).select("page").collect()
        .map(_.getString(0)).sorted.toSeq
      // user 1's purchase at +20min matches clicks at +0 and +10 (both
      // within 30min lookback); user 2's click never matches
      assert(rows == Seq("home", "product"))
      // a click OUTSIDE the lookback window does not match
      clicks.addData((3L, ts(100), "old"))
      buys.addData((3L, ts(200), 5.0))
      clicks.addData((9L, ts(600), "x"))
      buys.addData((9L, ts(600), 0.0))
      q.processAllAvailable()
      assert(spark.table("ivj_test").where($"amount" === 5.0).isEmpty)
    } finally q.stop()
  }

  test("intervalJoinStream: same-named ts columns don't collide (right side renamed)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    // BOTH streams call their time column "ts" — the common same-schema
    // case; the result must still be writable (no duplicate names).
    val joined = StreamingOps.intervalJoinStream(
      buys.toDF().toDF("user_id", "ts", "amount"),
      clicks.toDF().toDF("user_id", "ts", "page"),
      "user_id", "ts", "ts", lookback = "30 minutes", watermark = "1 hour")
    assert(joined.columns.toSeq.distinct == joined.columns.toSeq,
      joined.columns.mkString(","))
    assert(joined.columns.contains("ts") && joined.columns.contains("ts_right"))
    val q = joined.writeStream.format("memory").queryName("ivj_samename")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), "home"))
      buys.addData((1L, ts(20), 9.99))
      clicks.addData((9L, ts(300), "x")); buys.addData((9L, ts(300), 0.0))
      q.processAllAvailable()
      assert(spark.table("ivj_samename").where($"amount" === 9.99).count() == 1)
    } finally q.stop()
  }

  test("intervalJoinStream refuses when the right side already has the <name>_right rename target") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "amount")
    // Right has BOTH `ts` (clashing) and `ts_right` (the rename target):
    // the rename would mint a duplicate `ts_right` — refuse loudly.
    val right = Seq((1L, ts(0), "home")).toDF("user_id", "ts", "page")
      .withColumn("ts_right", lit("taken"))
    val ex = intercept[IllegalArgumentException] {
      StreamingOps.intervalJoinStream(left, right, "user_id", "ts", "ts")
    }
    assert(ex.getMessage.contains("ts_right"))
    // The LEFT side owning the rename target is the same duplicate:
    // left (ts, ts_right) joined to right's ts renamed ts_right.
    val leftTaken = left.withColumn("ts_right", lit("taken"))
    val rightPlain = Seq((1L, ts(0), "home")).toDF("user_id", "ts", "page")
    val ex2 = intercept[IllegalArgumentException] {
      StreamingOps.intervalJoinStream(leftTaken, rightPlain, "user_id", "ts", "ts")
    }
    assert(ex2.getMessage.contains("ts_right"))
  }

  test("enrichTextStream rejects a non-streaming-safe embedder up front with a clear message") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.enrichTextStream(stream, "text",
        graft.embed.Word2VecEmbedder(dim = 8))
    }
    assert(e.getMessage.contains("narrow transform"), e.getMessage)
    // the streaming-safe embedder passes the same gate
    val ok = StreamingOps.enrichTextStream(stream, "text",
      graft.embed.HashEmbedder(8))
    assert(ok.isStreaming)
  }

  test("broadcast Word2Vec embedder enriches a DENSE stream; vectors equal the batch path bitwise") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("spark cluster compute engine distributed",
      "spark engine query compute", "cat dog pet animal fur")
      .toDF("text")
    val w2v = graft.embed.Word2VecEmbedder(dim = 8).fit(corpus, "text")
    val bcast = w2v.broadcastEmbedder(spark)
    val input = MemoryStream[(Timestamp, String)]
    val enriched = StreamingOps.enrichTextStream(
      input.toDF().toDF("ts", "text"), "text", bcast)
    assert(enriched.isStreaming)
    val q = enriched.writeStream.format("memory").queryName("w2v_stream")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "spark compute engine"), (ts(1), "cat dog"),
        (ts(2), "zzz oov only"))
      q.processAllAvailable()
      val streamed = spark.table("w2v_stream")
        .select($"text", $"vec").as[(String, Seq[Double])].collect().toMap
      val batch = w2v.embed(
          Seq("spark compute engine", "cat dog", "zzz oov only").toDF("text"),
          "text", "vec")
        .select($"text", $"vec").as[(String, Seq[Double])].collect().toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("sessionize: a null event time is dropped, not a crash-looping NPE") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.SessionEvent]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess_nullts")
      .outputMode("update").start()
    try {
      input.addData(StreamingOps.SessionEvent(1L, ts(0)),
        StreamingOps.SessionEvent(1L, null),
        StreamingOps.SessionEvent(1L, ts(10)))
      q.processAllAvailable() // would throw on an unguarded null sort key
      val last = spark.table("sess_nullts")
        .where($"user_id" === 1L).orderBy($"n_events".desc).head
      assert(last.getAs[Long]("n_events") == 2L) // the null row contributed nothing
      assert(last.getAs[Long]("n_sessions") == 1L)
    } finally q.stop()
  }

  test("sessionize: stateful gap sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.SessionEvent]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("update").start()
    try {
      // user 1: events at t0, t+10min (same session)
      input.addData(StreamingOps.SessionEvent(1L, ts(0)), StreamingOps.SessionEvent(1L, ts(10)))
      q.processAllAvailable()
      // user 1: event at t+50min -> 40min gap -> NEW session (state kept across batches)
      input.addData(StreamingOps.SessionEvent(1L, ts(50)))
      q.processAllAvailable()
      val last = spark.table("sess_test")
        .where($"user_id" === 1L).orderBy(desc("n_events")).head
      assert(last.getAs[Long]("n_sessions") == 2L)
      assert(last.getAs[Long]("n_events") == 3L)
    } finally q.stop()
  }

  test("sessionize: a late cross-batch event cannot open a phantom session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.SessionEvent]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("update").start()
    try {
      // t=0, then t=40 (session 2, frontier at 40)
      input.addData(StreamingOps.SessionEvent(7L, ts(0)))
      q.processAllAvailable()
      input.addData(StreamingOps.SessionEvent(7L, ts(40)))
      q.processAllAvailable()
      // LATE event t=5: in-gap vs the frontier; must NOT regress it
      input.addData(StreamingOps.SessionEvent(7L, ts(5)))
      q.processAllAvailable()
      // t=38: within gap of frontier 40 -> same session (a regressed
      // frontier at 5 would have counted a phantom session 3)
      input.addData(StreamingOps.SessionEvent(7L, ts(38)))
      q.processAllAvailable()
      val last = spark.table("sess_late")
        .where($"user_id" === 7L).orderBy(desc("n_events")).head
      assert(last.getAs[Long]("n_sessions") == 2L)
      assert(last.getAs[Long]("n_events") == 4L)
    } finally q.stop()
  }

  test("quality + PII scrub + repetition signals compose on a stream (all narrow)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Pii, QualitySignals}
    val input = MemoryStream[(Long, String)]
    // The round-3 pipeline stages are pure projections/filters, so the
    // SAME operators run unchanged under readStream — no stateful ops,
    // no watermark needed.
    val cleaned = QualitySignals.signals(
        Pii.redact(input.toDF().toDF("id", "text"), "text", "clean"), "clean")
      .where(col("gopher_keep"))
      .select(col("id"), col("clean"), col("n_tokens"), col("n_emails"))
    val q = cleaned.writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    try {
      val good = (1 to 15).map(i => s"word$i").mkString(" ")
      input.addData(
        (1L, s"$good mail me a@b.co"),
        (2L, "spam spam spam spam spam"))  // repetitive -> dropped
      q.processAllAvailable()
      val rows = spark.table("scrub_stream").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
      assert(rows.head.getAs[String]("clean").endsWith("mail me <EMAIL>"))
      assert(rows.head.getAs[Long]("n_emails") == 1L)
    } finally q.stop()
  }

  test("enrichTextStream composes embedding + analysis on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val enriched = StreamingOps.enrichTextStream(
      input.toDF().toDF("text"), "text", HashEmbedder(8))
    val q = enriched.writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      input.addData("the quick brown fox")
      q.processAllAvailable()
      val row = spark.table("enrich_test").head
      assert(row.getSeq[Double](row.fieldIndex("vec")).length == 8)
      assert(row.getAs[Int]("n_tokens") == 4)
      assert(row.getAs[String]("fingerprint").nonEmpty)
    } finally q.stop()
  }

  test("nearDupIngestStream: restart from checkpoint loses no index updates and re-admits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-neardup-restart").toString
    val mk = () => MemoryStream[(Long, String, Timestamp)]

    // Run 1: two batches land, then the query stops (simulated crash —
    // from the engine's view a stop and a crash both end mid-stream;
    // recovery must come from the checkpoint + persisted index alone).
    val in1 = mk()
    val q1 = StreamingOps.nearDupIngestStream(
      in1.toDF().toDF("id", "text", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt")
    try {
      in1.addData(
        (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2L, "completely different text about spark streaming engines and state", ts(1)))
      q1.processAllAvailable()
    } finally q1.stop()

    // Run 2: a FRESH query over the same checkpoint/index/survivor
    // paths (MemoryStream state cannot survive a JVM crash, so the new
    // source stands in for the re-attached upstream; batchIds continue
    // from the checkpoint). A replayable source re-serves the already-
    // committed offsets — model that by re-adding batch 0's data first
    // (the checkpoint marks it committed, so it is NOT re-processed;
    // asserted below by doc 1/2 appearing in `kept` exactly once). Doc
    // 3 then duplicates pre-restart survivor 1 — only the persisted
    // band index can know that.
    val in2 = mk()
    val q2 = StreamingOps.nearDupIngestStream(
      in2.toDF().toDF("id", "text", "ts"),
      s"$dir/index", s"$dir/kept", s"$dir/ckpt")
    try {
      in2.addData(
        (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2L, "completely different text about spark streaming engines and state", ts(1)))
      in2.addData(
        (3L, "the quick brown fox jumps over the lazy dog", ts(10)),
        (4L, "yet another unrelated document mentioning catalysts and codegen", ts(11)))
      q2.processAllAvailable()

      val kept = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSeq
      // No duplicate admissions: doc 3 dropped against the pre-restart
      // index; no id admitted twice across the restart.
      assert(kept.sorted == Seq(1L, 2L, 4L), s"kept after restart: $kept")
      assert(kept.distinct.length == kept.length)
      // No lost index updates: all three survivors' bands present
      // (4 bands each), still duplicate-free.
      val bands = spark.read.parquet(s"$dir/index")
        .select("band").collect().map(_.getString(0))
      assert(bands.length == 12 && bands.distinct.length == 12,
        s"index bands after restart: ${bands.length} (${bands.distinct.length} distinct)")
      // And the recovered gate keeps screening: a dup of a POST-restart
      // survivor dies in the next batch.
      in2.addData((5L, "yet another unrelated document mentioning catalysts and codegen", ts(20)))
      q2.processAllAvailable()
      val keptIds = spark.read.parquet(s"$dir/kept").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(keptIds == Set(1L, 2L, 4L), s"kept after batch 3: $keptIds")
    } finally q2.stop()
  }

  test("nearDupScreenBatch: a crash-orphaned index with no data files does not wedge replay") {
    val dir = Files.createTempDirectory("graft-neardup-orphan").toString
    // Simulate a first attempt that died mid-write: indexPath exists
    // but holds only an empty batch dir (e.g. a leftover _temporary) —
    // no parquet data files anywhere, so schema INFERENCE would throw.
    val orphan = java.nio.file.Paths.get(dir, "index", "batch=0", "_temporary")
    java.nio.file.Files.createDirectories(orphan)
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
      (2L, "the quick brown fox jumps over the lazy dog", ts(1)))
      .toDF("id", "text", "ts")
    // The replay must read the orphaned index as empty and proceed.
    val kept = StreamingOps.nearDupScreenBatch(b0, s"$dir/index", 0L,
      "id", "text", "ts").select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"kept: $kept")
    val bands = spark.read.parquet(s"$dir/index")
      .select("band").collect().map(_.getString(0))
    assert(bands.length == 4 && bands.distinct.length == 4)
  }

  test("driftMonitorStream logs per-batch PSI against a fixed reference; replay overwrites") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val dir = Files.createTempDirectory("graft-drift").toString
    val ref = Seq("en", "en", "en", "de").toDF("lang") // 75/25
    val refCounts = graft.ops.Drift.sideCounts(ref, col("lang"), "n_ref")
    val q = StreamingOps.driftMonitorStream(input.toDF().toDF("lang"),
      refCounts, col("lang"), s"$dir/log", s"$dir/ckpt")
    try {
      input.addData("en", "en", "en", "de") // matches ref -> psi 0
      q.processAllAvailable()
      input.addData("fr", "fr", "fr", "fr") // unseen bucket -> big psi
      q.processAllAvailable()
      val log = StreamingOps.driftLog(spark, s"$dir/log")
        .orderBy("batch_id").collect()
      assert(log.length == 2, log.mkString("; "))
      assert(log(0).getAs[Double]("psi") == 0.0)
      assert(log(0).getAs[Long]("n_rows") == 4L)
      assert(log(1).getAs[Double]("psi") > 0.25)
      assert(log(1).getAs[String]("worst_bucket") == "fr")
    } finally q.stop()
    // a re-run of the same batch id replaces its row (idempotent log)
    val before = StreamingOps.driftLog(spark, s"$dir/log").count()
    val input2 = MemoryStream[String]
    val q2 = StreamingOps.driftMonitorStream(input2.toDF().toDF("lang"),
      refCounts, col("lang"), s"$dir/log", s"$dir/ckpt2")
    try {
      input2.addData("en", "de") // batch id 0 again, fresh checkpoint
      q2.processAllAvailable()
      val log = StreamingOps.driftLog(spark, s"$dir/log")
      assert(log.count() == before) // overwrote batch=0, no duplicate
      assert(log.where(col("batch_id") === 0).head().getAs[Long]("n_rows") == 2L)
    } finally q2.stop()
  }
}
