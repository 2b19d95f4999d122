package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.HashFunctions
import graft.embed.HashEmbedder

/** Property tests (SURVEY §5 test plan): dedup idempotence, hash and
  * embedding invariants, minhash estimate monotonicity. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge isn't in the offline dependency cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val textGen = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: fused text kernels == HOF twins on adversarial generated texts") {
    // The corpus parity pins cover real data; this generates the
    // shapes real data underrepresents — runs of separators (empty
    // tokens), non-BMP code points (UTF-16 units != code points),
    // single-char and repeated tokens, leading/trailing spaces — and
    // asserts EVERY fused kernel against its interpreted HOF twin.
    import graft.functions.TextFunctions._
    val token = Gen.oneOf("a", "bb", "the", "und", "𝕏", "𝕏y𝕏", "café",
      "ccccccccc", "x1", ".")
    val sep = Gen.oneOf(" ", "  ", "   ")
    val adversarialText = for {
      n <- Gen.chooseNum(0, 30)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(math.max(n - 1, 0) + 2, sep)
    } yield (seps.head +: toks.zip(seps.tail).flatMap { case (t, s) => Seq(t, s) })
      .mkString("").dropRight(1)
    samples(Gen.listOfN(40, adversarialText), 8).foreach { texts =>
      val df = texts.toDF("text")
      val toks = tokens(col("text"))
      val bad = df.where(!(
        (stopwordRatio(col("text")) <=> stopwordRatioOf(toks)) &&
        (meanTokenLen(col("text")) <=> meanTokenLenOf(toks)) &&
        (bpeTokenEstimate(col("text")) <=> bpeTokenEstimateOf(toks)) &&
        (qualityScore(col("text")) <=> qualityScoreOf(col("text"), toks)) &&
        (langGuess(col("text")) <=> langGuessOf(toks)) &&
        (simhash63(col("text")) <=> simhash63Sql(col("text"))) &&
        (shingles(col("text"), 3) <=> shinglesSql(col("text"), 3)) &&
        (chunks(col("text"), 8, 3) <=> chunksSql(col("text"), 8, 3)) &&
        (chunks(col("text"), 4, 0) <=> chunksSql(col("text"), 4, 0))))
      assert(bad.count() == 0,
        s"fused/HOF divergence in: ${bad.select("text").as[String].collect().take(3).mkString(" | ")}")
      // TokenStatsExpr counts vs the Gopher HOF construction
      val badQ = df.where(!(
        QualitySignals.tokenSignals(col("text")) <=>
          QualitySignals.tokenSignalsSql(col("text")))).count()
      assert(badQ == 0)
    }
  }

  test("property: exact dedup keeps min id per text and is idempotent") {
    samples(Gen.listOfN(30, textGen), 10).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = Dedup.exact(df, "id", "text")
      val ids = once.select("id").as[Long].collect().toSet
      val expect = texts.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).min.toLong).toSet
      assert(ids == expect, s"for $texts")
      val again = Dedup.exact(once.select(col("id"), col("dedup_key").as("text")), "id", "text")
      assert(again.count() == once.count())
    }
  }

  test("property: upsert is idempotent; key set = target ∪ batch; batch rows win") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 20L), word)
    samples(Gen.zip(Gen.listOfN(15, rowGen), Gen.listOfN(8, rowGen)), 8)
      .foreach { case (t, b) =>
        // unique keys per side (last wins pre-aggregation, as documented)
        val target = t.toMap.toSeq.toDF("k", "v")
        val batch = b.toMap.toSeq.toDF("k", "v")
        val once = Mutations.upsert(target, batch, Seq("k"))
        val onceRows = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(onceRows.keySet == t.toMap.keySet ++ b.toMap.keySet)
        b.toMap.foreach { case (k, v) => assert(onceRows(k) == v) }
        (t.toMap -- b.toMap.keySet).foreach { case (k, v) => assert(onceRows(k) == v) }
        val twice = Mutations.upsert(once, batch, Seq("k")).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(twice == onceRows, "upsert must be idempotent")
      }
  }

  test("property: hash60 is non-negative, < 2^60, distinct on distinct inputs") {
    val strs = samples(Gen.listOfN(50, Gen.alphaNumStr), 20).flatten
    val hs = strs.map(HashFunctions.hash60Local)
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.size == strs.distinct.size)
  }

  test("property: embeddings are unit-norm and cosine-bounded") {
    val emb = HashEmbedder(24)
    samples(textGen, 30).foreach { t =>
      val v = emb.embedQuery(t)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"norm for '$t'")
      val w = emb.embedQuery(t.reverse + "x")
      val cos = v.zip(w).map { case (a, b) => a * b }.sum
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
  }

  test("property: delete semantics == anti-join on random id sets") {
    samples(Gen.listOfN(12, textGen), 5).zipWithIndex.foreach { case (texts, k) =>
      val distinct = texts.distinct
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prop$k").toString + "/s"
      val store = graft.store.DocumentStore.fromTexts(
        spark, dir, distinct, Nil, graft.StoreConfig(), HashEmbedder(8))
      val n = store.documentCount
      val toDelete = distinct.indices.filter(_ % 3 == 0).map(_.toLong)
      if (toDelete.nonEmpty && toDelete.size < n) {
        val expected = distinct.zipWithIndex
          .collect { case (t, i) if !toDelete.contains(i.toLong) => t }
        store.deleteByIds(toDelete)
        val kept = store.essential.orderBy("id").select("text").as[String].collect()
        assert(kept.toSeq == expected, s"delete mismatch for $distinct")
        // ids recompacted densely
        val ids = store.essential.select("id").as[Long].collect().sorted
        assert(ids.toSeq == (0L until (n - toDelete.size)))
      }
    }
  }

  test("property: minhash jaccard estimate correlates with true jaccard") {
    import graft.functions.TextFunctions
    val df = Seq(
      "alpha beta gamma delta eps zeta alpha beta gamma delta",
      "alpha beta gamma delta eps zeta alpha beta gamma zeta",
      "zeta eps delta gamma beta alpha zeta eps delta gamma").toDF("text")
    val sigs = df.select(TextFunctions.minhashSignature(col("text"), 3, 64).as("s"))
      .as[Seq[Long]].collect()
    def est(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2).toDouble / a.size
    assert(est(sigs(0), sigs(1)) > est(sigs(0), sigs(2)))
  }

  test("property: PII redaction is idempotent and never reintroduces matches") {
    val piiGen = Gen.oneOf(
      "mail me at x.y+z@host.org now", "+1-555-0100 is my line",
      "from 8.8.8.8 and 10.0.0.1", "no pii here",
      "a@b.io or c@d.co from 1.2.3.4 call +49-123-9999")
    samples(Gen.listOfN(10, piiGen), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = Pii.redact(df, "text").select(col("id"), col("text_redacted").as("text"))
      // redacted text has zero remaining matches...
      val counts = Pii.detect(once, "text")
        .select(col("n_emails") + col("n_phones") + col("n_ips")).as[Long].collect()
      assert(counts.forall(_ == 0L))
      // ...so a second redaction is the identity.
      val twice = Pii.redact(once, "text").select(col("text_redacted")).as[String].collect()
      val first = once.select("text").as[String].collect()
      assert(twice.toSeq == first.toSeq)
    }
  }

  test("property: card candidates == JVM reference on random planted digit runs") {
    // Independent JVM reimplementation of the r13 proposal/disposal
    // pipeline — maximal separator-joined digit runs; TIER 1 whole-run
    // (13-19 digit mass + group shape + Luhn); TIER 2 group-boundary
    // windows (<= 5 groups, every non-last group >= 4 digits, 13-19
    // mass, Luhn, leftmost-longest greedy non-overlap) when tier 1
    // fails — checked against the Column pipeline on randomized texts.
    // This pins the regex/split/filter SEMANTICS broadly (the r11 bug
    // class was exactly a proposal-shape hole no example test covered;
    // THIS property caught the r13 session that updated the Column
    // tiers without this mirror — a fused adjacent-PAN text disagreed).
    def luhnRef(s: String): Boolean = {
      val d = s.filter(_.isDigit).map(_ - '0')
      d.reverse.zipWithIndex.map { case (x, i) =>
        if (i % 2 == 1) { val y = x * 2; if (y > 9) y - 9 else y } else x
      }.sum % 10 == 0
    }
    def groupShapeOk(r: String): Boolean = {
      val gs = r.split("[- ]")
      gs.length == 1 || gs.init.forall(_.length >= 2)
    }
    // mirror of Pii.windowCandidatesCol: parts keep their ONE trailing
    // separator; windows enumerate (i asc, j desc) so the greedy pick
    // is leftmost-longest.
    def windowCandidatesRef(r: String): Seq[String] = {
      val parts = "[0-9]+[- ]?".r.findAllIn(r).toVector
      val m = parts.length
      if (m <= 1) return Seq.empty
      val wins = for {
        i <- 1 to m
        j <- math.min(i + 4, m) to i by -1
        s = parts.slice(i - 1, j - 1).mkString +
          parts(j - 1).replaceAll("[- ]$", "")
        if s.count(_.isDigit) >= 13 && s.count(_.isDigit) <= 19
        if parts.slice(i - 1, j - 1).forall(_.count(_.isDigit) >= 4)
        if luhnRef(s)
      } yield (i, j, s)
      var last = 0
      wins.collect { case (i, j, s) if i > last => last = j; s }
    }
    def refCandidates(text: String): Seq[String] = {
      val runs = Pii.CcPattern.r.findAllIn(text).toSeq
      runs.flatMap { r =>
        val digits = r.count(_.isDigit)
        if (digits >= 13 && digits <= 19 && groupShapeOk(r) && luhnRef(r)) Seq(r)
        else windowCandidatesRef(r)
      }
    }
    val digitRun = for {
      len <- Gen.chooseNum(10, 24)
      ds <- Gen.listOfN(len, Gen.numChar)
    } yield ds.mkString
    val grouped = Gen.oneOf(
      "4111-1111-1111-1111", "4111 1111 1111 1111", "3782 822463 10005",
      "4111-1111-1111-1112", "4222 2222 22222", "1234-5678-9012-3456-789",
      // single-digit-grouped shapes (score lists) — group-gate fodder
      "4 5 2 8 1 7 3 9 6 2 4 8 5", "7-7-7-7-7-7-7-7-7-7-7-7-7",
      "4222 2222 2222 2")
    val word = Gen.oneOf("pay", "ref", "order", "x", "10.0.0.1", "+1-555-0100")
    val token = Gen.frequency(3 -> word, 2 -> digitRun, 2 -> grouped)
    val textGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
    samples(Gen.listOfN(20, textGen), 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = df.select(col("id"),
          Pii.ccCandidatesCol(col("text")).as("c"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == refCandidates(t), s"text=<$t>")
      }
      // and the count surfaced by redactCc agrees
      val counts = Pii.redactCc(df, "text").select("id", "n_ccs")
        .as[(Long, Long)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(counts(i.toLong) == refCandidates(t).size.toLong, s"text=<$t>")
      }
    }
  }

  test("property: epochMix copy counts are floor(w) or ceil(w), rates within bounds") {
    val weights = Seq(0.0, 0.4, 1.0, 1.7, 3.0)
    val df = (0 until 400).map(i => (i.toLong, "s")).toDF("id", "lang")
    weights.foreach { w =>
      val copies = Sampling.epochMix(df, "id", "lang", Map("s" -> w))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      val (lo, hi) = (math.floor(w).toLong, math.ceil(w).toLong)
      assert(copies.values.forall(c => c == lo.max(1L).min(hi) || c == hi),
        s"copy count outside {floor,ceil} for w=$w")
      val total = copies.values.sum + (400 - copies.size) * 0 // dropped rows count 0
      assert(math.abs(total - w * 400) <= 400 * 0.1 + 1, s"rate off for w=$w: $total")
    }
  }

  test("property: seededShuffle emits each input row exactly once (any nShards)") {
    Seq(1, 3, 8).foreach { shards =>
      val df = (0 until 300).map(i => (i.toLong, s"r$i")).toDF("id", "payload")
      val out = Sampling.seededShuffle(df, "id", shards)
      assert(out.count() == 300)
      assert(out.select("id").distinct().count() == 300)
      val perShard = out.groupBy("shard").count().as[(Int, Long)].collect().toMap
      assert(perShard.keys.forall(s => s >= 0 && s < shards))
      // positions dense per shard
      perShard.foreach { case (s, n) =>
        val pos = out.where(col("shard") === s).select("shard_pos").as[Long].collect().sorted
        assert(pos.toSeq == (1L to n))
      }
    }
  }

  test("property: bloomExactAgainst == exactAgainst on random corpora and batches") {
    samples(Gen.zip(Gen.listOfN(20, textGen), Gen.listOfN(12, textGen)), 8)
      .foreach { case (corpusTexts, batchTexts) =>
        val corpus = corpusTexts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val batch = batchTexts.zipWithIndex
          .map { case (t, i) => (100L + i, t) }.toDF("id", "text")
        val want = Dedup.exactAgainst(batch, corpus, "text")
          .select("id").as[Long].collect().sorted.toSeq
        // deliberately undersized + high-fpp filter: correctness must
        // not depend on filter quality
        val got = Dedup.bloomExactAgainst(batch, corpus, "text",
            prebuilt = Some(Dedup.buildTextBloom(corpus, "text",
              expectedItems = 2L, fpp = 0.4)))
          .select("id").as[Long].collect().sorted.toSeq
        assert(got == want, s"corpus=$corpusTexts batch=$batchTexts")
      }
  }

  test("property: zvalue round-trips through bit de-interleaving") {
    def deinterleave(z: Long, nCols: Int, bits: Int): Seq[Long] =
      (0 until nCols).map { c =>
        (0 until bits).map(i => ((z >> (i * nCols + c)) & 1L) << i).sum
      }
    val coord = Gen.chooseNum(0L, (1L << 21) - 1)
    samples(Gen.zip(coord, coord), 40).foreach { case (x, y) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(graft.ops.Layout.zvalue(Seq(col("x"), col("y"))).as("z"))
        .as[Long].head()
      assert(deinterleave(z, 2, 21) == Seq(x, y), s"($x, $y) -> $z")
    }
  }

  test("property: randomProjection is linear up to terminal rounding") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    samples(Gen.zip(vecGen, vecGen), 10).foreach { case (a, b) =>
      val df = Seq((a, b, a.zip(b).map { case (x, y) => x + y }))
        .toDF("a", "b", "ab")
      val row = df.select(
        graft.functions.VectorFunctions.randomProjection(col("a"), "t", 4, 8).as("ra"),
        graft.functions.VectorFunctions.randomProjection(col("b"), "t", 4, 8).as("rb"),
        graft.functions.VectorFunctions.randomProjection(col("ab"), "t", 4, 8).as("rab"))
        .head()
      val (ra, rb, rab) = (row.getSeq[Double](0), row.getSeq[Double](1), row.getSeq[Double](2))
      ra.indices.foreach { j =>
        assert(math.abs(rab(j) - (ra(j) + rb(j))) < 3e-6,
          s"j=$j ${rab(j)} vs ${ra(j) + rb(j)}")
      }
    }
  }

  test("property: funnel depth is monotone in the window size") {
    val ev = Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 100L),
      Gen.oneOf("view", "click", "buy")))
    samples(ev, 6).foreach { events =>
      val df = events.toDF("user_id", "ts", "etype")
      def depths(w: Long): Map[Long, Long] =
        EventOps.funnel(df, "user_id", "ts", "etype",
            Seq("view", "click", "buy"), window = w)
          .collect().map(r => r.getLong(0) ->
            r.getLong(r.fieldIndex("steps_completed"))).toMap
      val narrow = depths(20L)
      val wide = depths(80L)
      assert(narrow.keySet == wide.keySet) // entry is window-independent
      narrow.foreach { case (u, d) =>
        assert(d <= wide(u), s"user $u: narrow $d > wide ${wide(u)}")
      }
    }
  }

  test("property: SemDedup flag agrees with pairs (greedy min-id survivor rule)") {
    import graft.index.IvfIndex
    val model = IvfIndex.Model(IndexedSeq(
      IndexedSeq(1.0, 0.0, 0.0), IndexedSeq(0.0, 1.0, 0.0), IndexedSeq(0.0, 0.0, 1.0)))
    val coord = Gen.chooseNum(0.0, 1.0)
    val vecGen = Gen.listOfN(3, coord).map(_.toArray)
    samples(Gen.listOfN(20, vecGen), 6).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      val pairs = SemDedup.pairs(df, "id", "vec", model, 0.97)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val flags = SemDedup.flag(df, "id", "vec", model, 0.97).collect()
      // Every flagged dup appears as id_b of some pair; dup_of < id and
      // dup_of is the min id_a among its pairs.
      flags.foreach { r =>
        val id = r.getLong(0)
        if (r.getInt(2) == 1) {
          val mates = pairs.collect { case (a, b) if b == id => a }
          assert(mates.nonEmpty && r.getLong(3) == mates.min && r.getLong(3) < id)
        } else assert(!pairs.exists(_._2 == id) && r.isNullAt(3))
      }
      // NOTE deliberately NOT asserted: "dup_of references a kept row".
      // That closure does NOT hold for the greedy-by-id rule — in a
      // similarity chain 0~1~2 with 0≁2, rows 1 AND 2 are both dropped
      // and 2's dup_of points at the (also dropped) row 1. Both engines
      // implement exactly this, and the oracle pins it.
    }
  }

  test("property: DSIR weights are invariant to doc order and partitioning") {
    samples(Gen.listOfN(12, textGen), 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val shuffled = texts.zipWithIndex.reverse.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(3)
      val tgt = docs.where(col("doc_id") < 4)
      val a = Dsir.importanceWeights(docs, tgt, "doc_id", "text", buckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val b = Dsir.importanceWeights(shuffled, tgt, "doc_id", "text", buckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(a.toSeq === b.toSeq, s"order/partitioning changed weights for $texts")
    }
  }

  test("property: URL canonicalization is idempotent on randomized URL shapes") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
      host <- Gen.oneOf("A.com", "www.Ex.org", "x.Y.z.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/a", "/a/B/", "/a//", "/Tr/ail///")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_x=1", "?utm_a=1&z=Z&b=2", "?a=1&a=0")
      frag <- Gen.oneOf("", "#f", "#Frag/x?y=1")
    } yield s"$scheme://$host$port$path$q$frag"
    val urls = samples(urlGen, 120).distinct
    val once = urls.toDF("u").select(UrlOps.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    val twice = once.toDF("u").select(UrlOps.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(twice === once, "canonicalize is not idempotent")
    // canonical forms never retain the stripped material (default ports
    // are scheme-conditional, so they are covered by UrlOpsSpec instead)
    once.foreach { c =>
      assert(!c.contains("#") && !c.contains("utm_") && !c.endsWith("/") &&
        c.take(c.indexOf("://") max 0).forall(ch => !ch.isUpper), c)
    }
  }

  test("property: splitByGroup covers every row, is group-atomic, names valid") {
    val fracs = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))
    samples(Gen.listOfN(60, Gen.chooseNum(0, 12)), 8).foreach { groups =>
      val df = groups.zipWithIndex.map { case (g, i) => (i.toLong, s"g$g") }
        .toDF("id", "grp")
      val out = Sampling.splitByGroup(df, "grp", fracs, salt = "p")
        .select("id", "grp", "split")
        .as[(Long, String, String)].collect()
      assert(out.length == groups.length)                    // no row lost
      assert(out.forall(r => Set("train", "valid", "test")(r._3)))
      val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
      assert(byGroup.values.forall(_.size == 1), byGroup.toMap)
    }
  }

  test("property: PSI is non-negative and zero only for identical masses") {
    val langGen = Gen.oneOf("en", "de", "fr", "es")
    samples(Gen.listOfN(40, langGen), 6).foreach { xs =>
      val half = xs.length / 2
      val (a, b) = (xs.take(half), xs.drop(half))
      val psi = Drift.psi(a.toDF("lang"), b.toDF("lang"), col("lang"))
      assert(psi >= 0.0, s"negative PSI $psi for $xs")
      val contribs = Drift.bucketContributions(a.toDF("lang"), b.toDF("lang"),
        col("lang")).select("psi_contrib").as[Double].collect()
      assert(contribs.forall(_ >= 0.0), contribs.toSeq) // (p-q)ln(p/q) >= 0
    }
  }

  test("property: bestRepresentative keeper is a max-quality member of its cluster") {
    samples(Gen.listOfN(30, Gen.chooseNum(0, 5)), 6).foreach { comps =>
      val members = comps.zipWithIndex
        .map { case (c, i) => (i.toLong, c.toLong) }.toDF("node", "component")
      val quality = comps.indices
        .map(i => (i.toLong, ((i * 7919) % 13).toLong)).toDF("doc_id", "q")
      val got = Dedup.bestRepresentative(members, quality, "doc_id", "q")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expect = comps.zipWithIndex.groupBy(_._1.toLong).map { case (c, ms) =>
        val qs = ms.map { case (_, i) => (i.toLong, ((i * 7919) % 13).toLong) }
        val mx = qs.map(_._2).max
        (c, ms.size.toLong, mx, qs.filter(_._2 == mx).map(_._1).min)
      }.toSet
      assert(got.toSet === expect, s"for $comps")
    }
  }

  test("property: prefixJaccardPairs == ngramJaccardPairs on random corpora (incl. repeated hot phrases)") {
    // Random texts from a small vocabulary produce heavy shingle
    // sharing (both common AND rare shingles per doc), plus a planted
    // boilerplate phrase on a subset — the regime prefix filtering
    // prunes hardest and where an unsound prefix length would MISS
    // pairs. The PPJoin path must stay value-identical to the naive
    // join everywhere, at several thresholds.
    val boiler = "legal notice all rights reserved"
    samples(Gen.listOfN(24, textGen), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i % 3 == 0) s"$t $boiler" else t)
      }.toDF("id", "text")
      for (thr <- Seq(0.3, 0.5, 0.8)) {
        def norm(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .sortBy(t => (t._1, t._2)).toSeq
        val naive = norm(Dedup.ngramJaccardPairs(docs, "id", "text", 3, thr, None))
        val pref = norm(Dedup.prefixJaccardPairs(docs, "id", "text", 3, thr))
        assert(pref == naive, s"thr=$thr texts=$texts")
      }
    }
  }

  test("property: ngramCharSignals matches a brute-force reference on random token sequences") {
    // Brute-force reference, straight from the definition (no sorting,
    // no run-length folds): the distributed HOF implementation must
    // match it exactly, including the union-of-spans coverage.
    def refTop(toks: Seq[String], n: Int): Double = {
      val tot = math.max(toks.map(_.length).sum, 1).toDouble
      if (toks.size < n) return 0.0
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      val mass = grams.groupBy(identity).collect {
        case (g, occ) if occ.size >= 2 =>
          occ.size.toLong * (g.length - (n - 1))
      }
      val best = if (mass.isEmpty) 0L else mass.max
      BigDecimal(best / tot).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    def refDup(toks: Seq[String], n: Int): Double = {
      val tot = math.max(toks.map(_.length).sum, 1).toDouble
      if (toks.size < n) return 0.0
      val grams = toks.sliding(n).map(_.mkString(" ")).toVector
      val dup = grams.groupBy(identity).filter(_._2.size >= 2).keySet
      val covered = Array.fill(toks.size)(false)
      grams.zipWithIndex.foreach { case (g, p) =>
        if (dup(g)) (p until p + n).foreach(covered(_) = true)
      }
      val mass = toks.zipWithIndex.collect {
        case (t, i) if covered(i) => t.length.toLong
      }.sum
      BigDecimal(mass / tot).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    // Small vocabulary FORCES repeats (including overlapping runs of a
    // single token — the adversarial case for span union and for the
    // run-length fold's incremental max).
    val shortWord = Gen.oneOf("a", "bb", "ccc", "a", "bb")
    val seqGen = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, shortWord))
    val cases = samples(Gen.listOfN(25, seqGen), 12).flatten
    val df = cases.zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    // BOTH execution paths (the fused imperative expression and the
    // HOF reference form) must match the brute-force reference — and
    // therefore each other — exactly.
    Seq(true, false).foreach { fused =>
      val got = QualitySignals
        .ngramCharSignals(df, "text", topNs = Seq(2, 3, 4),
          dupNs = 5 to 10, fused = fused)
        .orderBy("doc_id").collect()
      got.zip(cases).foreach { case (r, toks) =>
        Seq(2, 3, 4).foreach { n =>
          assert(r.getAs[Double](s"top_${n}_gram_char_frac") == refTop(toks, n),
            s"fused=$fused top n=$n toks=$toks")
        }
        (5 to 10).foreach { n =>
          assert(r.getAs[Double](s"dup_${n}_gram_char_frac") == refDup(toks, n),
            s"fused=$fused dup n=$n toks=$toks")
        }
        assert(!r.isNullAt(r.fieldIndex("rep_keep")), s"fused=$fused")
      }
    }
  }
}
