package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {

  private def gradient(id: Long)(x: Int, y: Int): Int =
    Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt

  test("PNG and BMP round-trip losslessly (the oracle precondition)") {
    for (fmt <- Seq("png", "bmp"); id <- Seq(0L, 1L, 7L, 12345L)) {
      val bytes = MediaCodec.encodeGray(64, 48, fmt)(gradient(id))
      val img = MediaCodec.decodeGray(bytes).get
      assert(img.width == 64 && img.height == 48)
      for (y <- 0 until 48; x <- 0 until 64)
        assert(img.gray(y * 64 + x) == gradient(id)(x, y),
          s"$fmt id=$id pixel ($x,$y)")
    }
  }

  test("GIF round-trips grayscale losslessly (256-entry palette)") {
    val bytes = MediaCodec.encodeGray(16, 16, "gif")(gradient(3L))
    val img = MediaCodec.decodeGray(bytes).get
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.gray(y * 16 + x) == gradient(3L)(x, y))
  }

  test("JPEG decodes (real reader) but is NOT pinned bit-exact") {
    val bytes = MediaCodec.encodeGray(64, 48, "jpg")(gradient(5L))
    val img = MediaCodec.decodeGray(bytes).get
    assert(img.width == 64 && img.height == 48)
    // lossy: values near, not equal — assert the decode is sane, not exact
    val diffs = for (y <- 0 until 48; x <- 0 until 64)
      yield math.abs(img.gray(y * 64 + x) - gradient(5L)(x, y))
    assert(diffs.max <= 160 && diffs.sum.toDouble / diffs.size < 64.0)
  }

  test("decode sniffs the format from bytes; garbage/empty/null -> None") {
    val png = MediaCodec.encodeGray(8, 8, "png")(gradient(1L))
    assert(MediaCodec.decodeGray(png).isDefined)
    assert(MediaCodec.decodeGray(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(MediaCodec.decodeGray(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeGray(null).isEmpty)
    // truncated PNG: header sniffs fine, decode must still not throw
    assert(MediaCodec.decodeGray(png.take(20)).isEmpty)
  }

  test("decompression-bomb guard: huge header dims -> None, never a raster") {
    // A hostile asset is a TINY byte payload whose header declares a
    // HUGE raster; ImageIO.read would allocate from the header dims
    // before noticing anything wrong (r14 ADVICE finding). Build one:
    // take a real 8x8 PNG and patch IHDR to 60000x60000 (3.6 G pixels,
    // ~14 GB as an int raster), recomputing the IHDR CRC so the reader
    // trusts the header. The guard must peek the dims and bail BEFORE
    // any allocation.
    val png = MediaCodec.encodeGray(8, 8, "png")(gradient(2L))
    val bomb = png.clone()
    val ihdrData = 16 // 8-byte signature + 4 length + 4 "IHDR" -> data
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(ihdrData, 60000)     // width
    putInt(ihdrData + 4, 60000) // height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 4 + 13) // "IHDR" + 13 data bytes
    putInt(ihdrData + 13, crc.getValue.toInt)
    assert(MediaCodec.decodeGray(bomb).isEmpty,
      "60000x60000 declared dims must be rejected from the header peek")
    // the cap itself is enforced, not some side effect: a legitimate
    // image over a caller-tightened cap is rejected; at the cap, kept
    assert(MediaCodec.decodeGray(png, maxPixels = 63L).isEmpty)
    assert(MediaCodec.decodeGray(png, maxPixels = 64L).isDefined)
  }

  test("grayStats are the exact integer fold") {
    val img = MediaCodec.GrayImage(2, 2, Array(10, 20, 30, 40))
    assert(MediaCodec.grayStats(img) == ((4L, 100L, 10, 40)))
  }

  test("grayQualityStats: exact sum-of-squares / distinct levels / modal freq") {
    val img = MediaCodec.GrayImage(2, 3, Array(10, 10, 10, 20, 20, 30))
    val (sumSq, nDist, topFreq) = MediaCodec.grayQualityStats(img)
    assert(sumSq == 3L * 100 + 2L * 400 + 900)
    assert(nDist == 3 && topFreq == 3L)
    // a blank frame is unmistakable: one level, modal freq = n
    val blank = MediaCodec.GrayImage(4, 4, Array.fill(16)(77))
    val (_, d, f) = MediaCodec.grayQualityStats(blank)
    assert(d == 1 && f == 16L)
  }

  test("aHash63 hand-check on a half-dark half-bright image") {
    // left half 0, right half 200: cells 0..3 of each row dark (below
    // mean=100), cells 4..7 bright -> bits j where j%8 >= 4, except
    // bit 63 (sign-safe: never set by construction).
    val w = 64; val h = 48
    val px = Array.tabulate(w * h)(i => if (i % w < w / 2) 0 else 200)
    val hash = MediaCodec.aHash63(MediaCodec.GrayImage(w, h, px))
    val expected = (0 until 63).filter(j => j % 8 >= 4)
      .foldLeft(0L)((acc, j) => acc | (1L << j))
    assert(hash == expected)
    assert(hash >= 0L, "bit 63 must never be set")
  }

  test("aHash63 is stable under brightness shift and JPEG-ish noise") {
    val base = MediaCodec.GrayImage(64, 48,
      Array.tabulate(64 * 48)(i => gradient(9L)(i % 64, i / 64)))
    val shifted = MediaCodec.GrayImage(64, 48, base.gray.map(g => (g + 20) min 255))
    val d = java.lang.Long.bitCount(
      MediaCodec.aHash63(base) ^ MediaCodec.aHash63(shifted))
    assert(d <= 8, s"perceptual hash moved $d bits under a brightness shift")
  }

  test("downscale2x is the exact floor mean of each 2x2 block") {
    val img = MediaCodec.GrayImage(4, 2, Array(1, 2, 3, 4, 5, 6, 7, 8))
    val s = MediaCodec.downscale2x(img)
    assert(s.width == 2 && s.height == 1)
    assert(s.gray.toSeq == Seq((1 + 2 + 5 + 6) / 4, (3 + 4 + 7 + 8) / 4))
    intercept[IllegalArgumentException] {
      MediaCodec.downscale2x(MediaCodec.GrayImage(3, 2, Array.fill(6)(0)))
    }
  }

  test("RGB encode/decode round-trips all three channels losslessly; channel stats exact") {
    // three DISTINCT channel formulas — a red-only decode path cannot
    // pass by accident (the r14 item-#9 contract)
    def pix(x: Int, y: Int): Int = {
      val r = (x * 7 + y * 13) % 256
      val g = (x * 11 + y * 5) % 256
      val b = (x * 3 + y * 19) % 256
      (r << 16) | (g << 8) | b
    }
    for (fmt <- Seq("png", "bmp")) {
      val img = MediaCodec.decodeRgb(MediaCodec.encodeRgb(16, 8, fmt)(pix)).get
      assert(img.width == 16 && img.height == 8)
      for (y <- 0 until 8; x <- 0 until 16)
        assert(img.rgb(y * 16 + x) == pix(x, y), s"$fmt pixel ($x,$y)")
    }
    val img = MediaCodec.decodeRgb(MediaCodec.encodeRgb(2, 1, "png")((x, _) =>
      if (x == 0) (10 << 16) | (20 << 8) | 30 else (40 << 16) | (5 << 8) | 255)).get
    val (n, rs, gs, bs) = MediaCodec.rgbChannelStats(img)
    assert(n == 2L)
    assert(rs == ((50L, 10, 40)))
    assert(gs == ((25L, 5, 20)))
    assert(bs == ((285L, 30, 255)))
    // decodeRgb shares decodeGray's guard contract
    assert(MediaCodec.decodeRgb(Array[Byte](9, 9, 9)).isEmpty)
    assert(MediaCodec.decodeRgb(null).isEmpty)
    val small = MediaCodec.encodeRgb(4, 4, "png")(pix)
    assert(MediaCodec.decodeRgb(small, maxPixels = 15L).isEmpty)
    assert(MediaCodec.decodeRgb(small, maxPixels = 16L).isDefined)
    // decodeGray on a color image still reads the red channel (the
    // documented defined-channel contract, now an explicit cross-pin)
    val gray = MediaCodec.decodeGray(MediaCodec.encodeRgb(16, 8, "png")(pix)).get
    for (y <- 0 until 8; x <- 0 until 16)
      assert(gray.gray(y * 16 + x) == ((pix(x, y) >> 16) & 0xFF))
  }

  test("WAV PCM16 mono round-trips exactly") {
    val samples = Array.tabulate(500)(i =>
      Math.floorMod(7L * 37 + i.toLong * 97, 2001L).toInt - 1000)
    val bytes = MediaCodec.encodeWavPcm16(16000, samples)
    val a = MediaCodec.decodeWav(bytes).get
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("WAV parse walks chunk lists and folds stereo with floor division") {
    // hand-build a stereo WAV with a LIST chunk between fmt and data
    val sr = 8000
    val frames = Seq((100, 200), (-3, 0), (-5, -6), (32767, 32767))
    val dataLen = frames.size * 4
    val listPayload = "INFOsoft".getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer
      .allocate(12 + 24 + 8 + listPayload.length + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 24 + 8 + listPayload.length + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(sr).putInt(sr * 4).putShort(4).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(listPayload.length).put(listPayload)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach { case (l, r) => buf.putShort(l.toShort).putShort(r.toShort) }
    val a = MediaCodec.decodeWav(buf.array()).get
    assert(a.sampleRate == sr && a.channels == 2)
    // (-5 + -6) / 2 must floor to -6, not truncate to -5
    assert(a.samples.toSeq == Seq(150, -2, -6, 32767))
  }

  test("WAV parse rejects malformed input instead of throwing") {
    assert(MediaCodec.decodeWav(null).isEmpty)
    assert(MediaCodec.decodeWav(Array.fill[Byte](50)(0)).isEmpty)
    val good = MediaCodec.encodeWavPcm16(16000, Array(1, 2, 3))
    assert(MediaCodec.decodeWav(good).isDefined)
    assert(MediaCodec.decodeWav(good.take(30)).isEmpty)       // truncated
    val nonPcm = good.clone(); nonPcm(20) = 3                 // fmt=IEEE float
    assert(MediaCodec.decodeWav(nonPcm).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8             // bits=8
    assert(MediaCodec.decodeWav(eightBit).isEmpty)
  }

  test("property: WAV encode/decode round-trips arbitrary PCM16 exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      n <- Gen.chooseNum(0, 2000)
      samples <- Gen.listOfN(n, Gen.chooseNum(Short.MinValue.toInt,
        Short.MaxValue.toInt))
    } yield (rate, samples.toArray)
    (0 until 50).foreach { i =>
      val (rate, samples) = gen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val a = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(rate, samples)).get
      assert(a.sampleRate == rate && a.channels == 1)
      assert(a.samples.toSeq == samples.toSeq, s"case $i n=${samples.length}")
    }
  }

  test("property: PNG and BMP round-trip arbitrary gray rasters exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, px.toArray)
    for (fmt <- Seq("png", "bmp"); i <- 0 until 25) {
      val (w, h, px) = gen.apply(Gen.Parameters.default, Seed(7L * i + 1)).get
      val img = MediaCodec.decodeGray(
        MediaCodec.encodeGray(w, h, fmt)((x, y) => px(y * w + x))).get
      assert(img.width == w && img.height == h, s"$fmt case $i dims")
      assert(img.gray.toSeq == px.toSeq, s"$fmt case $i pixels (${w}x$h)")
    }
  }

  test("audioHash63: frame-energy-over-median bits, hand-checked") {
    // 126 samples -> 63 frames of 2; frames alternate loud (100,100)
    // and quiet (1,1): energies 20000/2 alternating, median = the
    // 32nd-smallest of 63 = 2 (32 quiet, 31 loud frames since frame 0
    // is loud... frames 0,2,4,... = 32 loud? indices 0..62: even
    // indices loud -> 32 loud, 31 quiet -> sorted[31] = first loud?
    // 31 quiet values fill sorted[0..30], sorted[31] = 20000 (loud);
    // bits need e > median -> NO frame exceeds 20000 -> hash 0.
    val loudQuiet = Array.tabulate(126)(i => if ((i / 2) % 2 == 0) 100 else 1)
    val h1 = MediaCodec.audioHash63(MediaCodec.PcmAudio(16000, 1, loudQuiet)).get
    assert(h1 == 0L)
    // flip the parity: 31 loud / 32 quiet -> median = quiet energy 2,
    // the 31 loud frames (odd indices) exceed it
    val quietLoud = Array.tabulate(126)(i => if ((i / 2) % 2 == 1) 100 else 1)
    val h2 = MediaCodec.audioHash63(MediaCodec.PcmAudio(16000, 1, quietLoud)).get
    val expected = (0 until 63).filter(_ % 2 == 1)
      .foldLeft(0L)((acc, j) => acc | (1L << j))
    assert(h2 == expected)
    assert(h2 >= 0L, "bit 63 never set")
    // shorter than 63 samples: no frame evidence -> None
    assert(MediaCodec.audioHash63(MediaCodec.PcmAudio(16000, 1,
      Array.fill(62)(5))).isEmpty)
    // stability under small noise: the near-dup property the banded
    // join exploits
    val base = Array.tabulate(630)(i =>
      Math.floorMod(7L * 37 + i.toLong * 97, 2001L).toInt - 1000)
    val noisy = base.map(v => (v + 3) min 32767)
    val d = java.lang.Long.bitCount(
      MediaCodec.audioHash63(MediaCodec.PcmAudio(16000, 1, base)).get ^
      MediaCodec.audioHash63(MediaCodec.PcmAudio(16000, 1, noisy)).get)
    assert(d <= 8, s"audio fingerprint moved $d bits under small noise")
  }

  test("audioStats: exact peak / sum_sq / zero-crossing fold") {
    val a = MediaCodec.PcmAudio(16000, 1, Array(3, -4, 0, 0, 5, -5))
    val (n, peak, sumSq, zc) = MediaCodec.audioStats(a)
    assert(n == 6L && peak == 5)
    assert(sumSq == 9L + 16 + 0 + 0 + 25 + 25)
    // crossings only where the PRODUCT is negative: 3*-4, 5*-5 — the
    // zero-touching pairs (-4,0), (0,0), (0,5) are not crossings
    assert(zc == 2L)
  }
}
