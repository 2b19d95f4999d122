package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate the fused kernels") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("""
      SELECT graft_dot(a, b) AS d, round(graft_cosine(a, b), 6) AS c,
             graft_l2(a, b) AS l, size(graft_hash_embed('hello', 16)) AS e
      FROM vecs""").head
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[Double]("c") ==
      math.rint(32.0 / (math.sqrt(14) * math.sqrt(77)) * 1e6) / 1e6)
    assert(r.getAs[Double]("l") == math.sqrt(27))
    assert(r.getAs[Int]("e") == 16)
  }

  test("sql embed matches driver-side embedQuery") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_hash_embed('the quick fox', 32) AS v")
      .head.getSeq[Double](0)
    assert(viaSql == graft.embed.HashEmbedder(32).embedQuery("the quick fox").toSeq)
  }

  test("wrong arity yields a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0))").head)
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("graft_dot"))
  }

  test("SQL kernels coerce non-double arrays instead of misreading strides") {
    GraftExtensions.register(spark)
    // Pre-fix the kernels declared no input types: array<int> children
    // passed analysis and getDouble read 8-byte strides over 4-byte
    // cells — silently wrong scores. The declared array<double> inputs
    // make analysis insert the cast (same coercion the DataFrame
    // surface applies via asDouble).
    val r = spark.sql(
      "SELECT graft_dot(array(1, 2), array(3, 4)) AS d").head
    assert(r.getAs[Double]("d") == 11.0)
    // scalar inputs fail ANALYSIS, not mid-task with a ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(1, 2)").head
    }
  }

  test("graft_hash_embed rejects a non-positive dim at analysis, not per row") {
    GraftExtensions.register(spark)
    // The SQL route bypasses HashEmbedder's constructor check; without
    // the expression-level guard dim=-1 passed analysis and threw
    // NegativeArraySizeException inside every task (dim=0 silently
    // returned empty vectors as embeddings).
    val neg = intercept[Exception](
      spark.sql("SELECT graft_hash_embed('x', -1)").head)
    assert(neg.getMessage.contains("positive"))
    val zero = intercept[Exception](
      spark.sql("SELECT graft_hash_embed('x', 0)").head)
    assert(zero.getMessage.contains("positive"))
  }

  test("graft_ngram_repetition from SQL matches the DataFrame gate's masses") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_ngram_repetition('a b a b a b c') AS m").head.getStruct(0)
    // 7 token chars; "a b" x3 -> 6; "a b a" x2 -> 6; "a b a b" x2 -> 8;
    // no repeated 5-/10-gram.
    assert(r.getAs[Long]("tot_chars") == 7L)
    assert(r.getAs[Long]("top_mass_2") == 6L)
    assert(r.getAs[Long]("top_mass_3") == 6L)
    assert(r.getAs[Long]("top_mass_4") == 8L)
    assert(r.getAs[Long]("dup_mass_5") == 0L)
    assert(r.getAs[Long]("dup_mass_10") == 0L)
    // The SQL surface carries the FULL A1.1 dup set like the DataFrame
    // default (r12) — not the narrowed Seq(5, 10) pair.
    (5 to 10).foreach(n =>
      assert(r.schema.fieldNames.contains(s"dup_mass_$n"), s"dup_mass_$n"))
    // null text -> null struct (the gate's null contract end-to-end)
    assert(spark.sql(
      "SELECT graft_ngram_repetition(CAST(NULL AS STRING)) AS m").head.isNullAt(0))
  }

  // --- r12: the dedup/search kernels on the SQL surface --------------

  test("graft_shingles / graft_minhash_sig / graft_minhash_bands match the Scala API") {
    GraftExtensions.register(spark)
    import graft.functions.TextFunctions
    val text = "the quick brown fox jumps over the quick brown dog"
    val viaScala = Seq(Tuple1(text)).toDF("t")
      .select(
        TextFunctions.shingles(col("t"), 3).as("sh"),
        TextFunctions.minhashBands(TextFunctions.shingles(col("t"), 3), 16, 4)
          .as("bands"))
      .head
    val viaSql = spark.sql(s"""
      SELECT graft_shingles('$text', 3) AS sh,
             graft_minhash_sig(graft_shingles('$text', 3), 16) AS sig,
             graft_minhash_bands(graft_shingles('$text', 3), 16, 4) AS bands""")
      .head
    assert(viaSql.getSeq[String](0) == viaScala.getSeq[String](0))
    assert(viaSql.getSeq[String](2) == viaScala.getSeq[String](1))
    assert(viaSql.getSeq[Long](1).size == 16)
    // shorter than n -> empty, not fabricated grams
    assert(spark.sql("SELECT graft_shingles('a b', 3) AS s")
      .head.getSeq[String](0).isEmpty)
  }

  test("graft_simhash63 and graft_dot_int8 match their DataFrame twins") {
    GraftExtensions.register(spark)
    import graft.functions.TextFunctions
    val viaScala = Seq(Tuple1("alpha beta gamma")).toDF("t")
      .select(TextFunctions.simhash63(col("t")).as("h")).head.getLong(0)
    val viaSql = spark.sql(
      "SELECT graft_simhash63('alpha beta gamma') AS h").head.getLong(0)
    assert(viaSql == viaScala)
    assert(spark.sql(
      "SELECT graft_dot_int8(array(1Y, 2Y, 3Y), array(4Y, 5Y, 6Y)) AS d")
      .head.getLong(0) == 32L)
  }

  test("graft_luhn_valid agrees with Pii's column fold (incl. separators)") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT graft_luhn_valid('4111111111111111') AS a,
             graft_luhn_valid('4111-1111-1111-1111') AS b,
             graft_luhn_valid('3782 822463 10005') AS c,
             graft_luhn_valid('4111111111111112') AS d""").head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(!r.getBoolean(3))
    // Arbitrary SQL input is the surface's contract, unlike the
    // internal fold (which only ever sees CcPattern candidates): empty
    // and non-digit-run inputs read FALSE — not an ANSI cast error
    // from the fold, not a silent null — and null stays null.
    val g = spark.sql("""
      SELECT graft_luhn_valid('') AS a,
             graft_luhn_valid('order-abc123x') AS b,
             graft_luhn_valid(CAST(NULL AS STRING)) AS c""").head
    assert(!g.getBoolean(0) && !g.getBoolean(1))
    assert(g.isNullAt(2))
  }

  test("graft_luhn_valid in a WHERE survives conjunct splitting over non-digit rows (ANSI)") {
    // ADVICE r12: the digit-run guard used to be an And conjunct the
    // optimizer may split/reorder during predicate pushdown, letting
    // the fold's cast('int') hit non-digit input under ANSI and throw.
    // Now a CaseWhen branch (guaranteed order): filtering a parquet
    // scan of mixed digit/non-digit rows must return the valid rows,
    // not error — exercised through a real scan so pushdown actually
    // runs, with an extra pushable conjunct to invite the split.
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("luhn_where").toString
    Seq((1L, "4111111111111111"), (2L, "order-abc123x"), (3L, ""),
        (4L, "4111111111111112"), (5L, null.asInstanceOf[String]))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("luhn_rows")
    val got = spark.sql(
      "SELECT id FROM luhn_rows WHERE graft_luhn_valid(v) AND id < 5")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("graft_pii_redact / graft_cc_redact match the DataFrame scrub") {
    GraftExtensions.register(spark)
    val text = "mail a.b@x.org or +44-123-4567 from 10.0.0.1; pay 4111-1111-1111-1111 inv 1234567890123456"
    val viaScala = Seq((1L, text)).toDF("id", "text")
    val scalaRedacted = graft.ops.Pii.redactCc(
        viaScala.select(col("id"),
          graft.ops.Pii.redactCol(col("text")).as("text")), "text")
      .select("text_cc_redacted").head.getString(0)
    val viaSql = spark.sql(
      s"SELECT graft_cc_redact(graft_pii_redact('$text')) AS t").head.getString(0)
    assert(viaSql == scalaRedacted)
    assert(viaSql.contains("<EMAIL>") && viaSql.contains("<PHONE>") &&
      viaSql.contains("<IP>") && viaSql.contains("<CC>"))
    // the Luhn-invalid 16-digit invoice number survives
    assert(viaSql.contains("1234567890123456"))
    // null text -> null out, end to end
    assert(spark.sql(
      "SELECT graft_cc_redact(CAST(NULL AS STRING)) AS t").head.isNullAt(0))
  }

  // --- r13: fingerprint distance + the quality/text tier -------------

  test("graft_hamming64 pairs with graft_simhash63 and is strictly typed") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT graft_hamming64(graft_simhash63('alpha beta gamma'),
                             graft_simhash63('alpha beta gamma')) AS same,
             graft_hamming64(0L, 255L) AS eight,
             graft_hamming64(0L, -1L) AS full,
             graft_hamming64(CAST(NULL AS BIGINT), 1L) AS n""").head
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 8)
    assert(r.getInt(2) == 64)
    assert(r.isNullAt(3))
    // strict bigint x bigint: ints and strings fail ANALYSIS (the
    // fingerprint contract — an implicit coercion would quietly accept
    // a string); an explicit CAST is the caller declaring intent.
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hamming64(1, 2)").head
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hamming64('a', 'b')").head
    }
    assert(spark.sql("SELECT graft_hamming64(CAST(1 AS BIGINT), CAST(3 AS BIGINT)) AS d")
      .head.getInt(0) == 1)
  }

  test("quality/text tier matches the Scala API bit-for-bit") {
    GraftExtensions.register(spark)
    import graft.functions.TextFunctions
    val text = "The quick brown fox, it jumps over the lazy dog! " * 3
    val df = Seq(Tuple1(text)).toDF("t")
    val viaScala = df.select(
      TextFunctions.qualityScore(col("t")).as("qs"),
      TextFunctions.langGuess(col("t")).as("lg"),
      TextFunctions.stopwordRatio(col("t")).as("sw"),
      TextFunctions.punctRatio(col("t")).as("pr"),
      TextFunctions.bpeTokenEstimate(col("t")).as("te"),
      TextFunctions.normalizeText(col("t")).as("nt"),
      TextFunctions.fingerprint(col("t")).as("fp"),
      graft.ops.UrlOps.canonicalize(lit("HTTPS://Ex.COM:443/a/?utm_x=1&b=2#f")).as("url"),
      TextFunctions.chunks(col("t"), 8, 2).as("ch")).head
    df.createOrReplaceTempView("qt_rows")
    val viaSql = spark.sql("""
      SELECT graft_quality_score(t) AS qs, graft_lang_guess(t) AS lg,
             graft_stopword_ratio(t) AS sw, graft_punct_ratio(t) AS pr,
             graft_token_estimate(t) AS te, graft_normalize_text(t) AS nt,
             graft_fingerprint(t) AS fp,
             graft_url_canonicalize('HTTPS://Ex.COM:443/a/?utm_x=1&b=2#f') AS url,
             graft_chunks(t, 8, 2) AS ch
      FROM qt_rows""").head
    assert(viaSql.getDouble(0) == viaScala.getDouble(0))
    assert(viaSql.getString(1) == viaScala.getString(1))
    assert(viaSql.getDouble(2) == viaScala.getDouble(2))
    assert(viaSql.getDouble(3) == viaScala.getDouble(3))
    assert(viaSql.getLong(4) == viaScala.getLong(4))
    assert(viaSql.getString(5) == viaScala.getString(5))
    assert(viaSql.getString(6) == viaScala.getString(6))
    assert(viaSql.getString(7) == viaScala.getString(7))
    assert(viaSql.getSeq[String](8) == viaScala.getSeq[String](8))
  }

  test("graft_quality_signals struct matches the DataFrame gate's columns") {
    GraftExtensions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over one lazy dog while other animals watch quietly from a nearby hill",
      "buy buy buy buy buy buy buy buy buy buy buy buy",
      "short",
      null.asInstanceOf[String])
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val viaDf = graft.ops.QualitySignals.signals(df, "text")
      .orderBy("id")
      .select("n_tokens", "distinct_token_ratio", "top_token_frac",
        "dup_bigram_frac", "symbol_ratio", "gopher_keep")
      .collect()
    df.createOrReplaceTempView("qs_rows")
    val viaSql = spark.sql(
      "SELECT id, graft_quality_signals(text) AS s FROM qs_rows ORDER BY id")
      .collect()
    texts.indices.foreach { i =>
      if (texts(i) == null) {
        // struct form: null text -> null struct; the column form nulls
        // each signal and coalesces keep to false — same information,
        // struct-shaped.
        assert(viaSql(i).isNullAt(1), "null text must yield a null struct")
        assert(!viaDf(i).getBoolean(5))
      } else {
        val s = viaSql(i).getStruct(1)
        assert(s.getLong(0) == viaDf(i).getLong(0))
        assert(s.getDouble(1) == viaDf(i).getDouble(1))
        assert(s.getDouble(2) == viaDf(i).getDouble(2))
        assert(s.getDouble(3) == viaDf(i).getDouble(3))
        assert(s.getDouble(4) == viaDf(i).getDouble(4))
        assert(s.getBoolean(5) == viaDf(i).getBoolean(5))
      }
    }
    // sanity on the gate itself: the repetitive spam row must drop
    assert(viaSql(1).getStruct(1).getBoolean(5) == false)
    assert(viaSql(0).getStruct(1).getBoolean(5) == true)
  }

  test("graft_jaccard matches the distributed pair screen's statistic") {
    GraftExtensions.register(spark)
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox leaps over the lazy dog"
    // same number Dedup.ngramJaccardPairs reports for this pair
    val viaPairs = graft.ops.Dedup.ngramJaccardPairs(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, threshold = 0.0).select("jaccard").head.getDouble(0)
    val viaSql = spark.sql(
      s"SELECT round(graft_jaccard('$a', '$b', 3), 4) AS j").head.getDouble(0)
    assert(viaSql == viaPairs)
    val edge = spark.sql("""
      SELECT graft_jaccard('x y', 'x y', 3) AS tooshort,
             graft_jaccard('a b c', CAST(NULL AS STRING), 3) AS n,
             graft_jaccard('a b c d', 'a b c d', 3) AS ident,
             graft_jaccard('a b c d', 'x y z w', 3) AS disjoint""").head
    assert(edge.isNullAt(0), "no n-grams on either side -> NULL, not 0/0")
    assert(edge.isNullAt(1))
    assert(edge.getDouble(2) == 1.0)
    assert(edge.getDouble(3) == 0.0)
  }

  test("graft_text_analysis struct matches TextAnalysis.analyze's columns") {
    GraftExtensions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog, it is a fine day.",
      "der hund und die katze ist ein tier",
      "zzz",
      null.asInstanceOf[String])
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val viaDf = graft.ops.TextAnalysis.analyze(df, "text").orderBy("id")
      .select("n_tokens", "est_bpe_tokens", "n_chars_calc", "stopword_ratio",
        "punct_ratio", "mean_token_len", "quality", "lang_guess", "fingerprint")
      .collect()
    df.createOrReplaceTempView("ta_rows")
    val viaSql = spark.sql(
      "SELECT id, graft_text_analysis(text) AS s FROM ta_rows ORDER BY id")
      .collect()
    texts.indices.foreach { i =>
      if (texts(i) == null) {
        assert(viaSql(i).isNullAt(1), "null text must yield a null struct")
      } else {
        val s = viaSql(i).getStruct(1)
        assert(s.getLong(0) == viaDf(i).getInt(0).toLong)       // n_tokens
        assert(s.getLong(1) == viaDf(i).getLong(1))             // est_bpe_tokens
        assert(s.getLong(2) == viaDf(i).getInt(2).toLong)       // n_chars
        assert(s.getDouble(3) == viaDf(i).getDouble(3))         // stopword_ratio
        assert(s.getDouble(4) == viaDf(i).getDouble(4))         // punct_ratio
        assert(s.getDouble(5) == viaDf(i).getDouble(5))         // mean_token_len
        assert(s.getDouble(6) == viaDf(i).getDouble(6))         // quality
        assert(s.getString(7) == viaDf(i).getString(7))         // lang_guess
        assert(s.getString(8) == viaDf(i).getString(8))         // fingerprint
      }
    }
    // one kernel pass, not one per feature (the point of the struct
    // form): the ANALYZED plan contains exactly one graft_text_stats
    // call — the optimized plan of this Seq-backed view constant-folds
    // to a LocalRelation, so assert pre-folding; the let1 array-bind
    // keeps the single call through optimization on real scans (the
    // same mechanism every fused entry point relies on).
    val plan = spark.sql("SELECT graft_text_analysis(text) AS s FROM ta_rows")
      .queryExecution.analyzed.toString
    assert(plan.split("graft_text_stats").length - 1 == 1,
      s"expected exactly one stats kernel in:\n$plan")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_text_analysis(42)").head
    }
  }

  test("bare NULL literals pass the strict pins (null-in/null-out, not a type error)") {
    GraftExtensions.register(spark)
    // An untyped NULL carries no wrong-type information for the pin to
    // reject, and generated SQL writes plain NULL, not CAST(NULL AS
    // STRING) — every strictly-pinned function must keep its null
    // contract for it. Exercised through a real scan so whole-stage
    // codegen actually compiles the NullType branch (hamming64's
    // primitive kernel emits a constant typed null there — an untyped
    // `null` inlined into `^` would fail javac and silently drop the
    // stage to interpreted).
    val dir = java.nio.file.Files.createTempDirectory("null_pins").toString
    Seq(Tuple1(1L)).toDF("id").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("null_rows")
    val r = spark.sql("""
      SELECT graft_pii_redact(NULL) AS a, graft_cc_redact(NULL) AS b,
             graft_simhash63(NULL) AS c, graft_luhn_valid(NULL) AS d,
             graft_quality_signals(NULL) AS e, graft_fingerprint(NULL) AS f,
             graft_hamming64(NULL, 5L) AS g, graft_hamming64(1L, NULL) AS h,
             graft_jaccard(NULL, 'a b c', 2) AS i, graft_chunks(NULL, 8, 0) AS j
      FROM null_rows""").head
    (0 until 10).foreach(k => assert(r.isNullAt(k), s"column $k must be null"))
  }

  test("r13 tier rejects mis-typed input at ANALYSIS (strict pins on composed trees)") {
    GraftExtensions.register(spark)
    // Without GraftStrictString these pass analysis: the built-ins
    // underneath carry ImplicitCastInputTypes and silently stringify.
    Seq("graft_quality_score(42)", "graft_lang_guess(42)",
        "graft_stopword_ratio(42)", "graft_punct_ratio(42)",
        "graft_token_estimate(42)", "graft_normalize_text(42)",
        "graft_fingerprint(42)", "graft_url_canonicalize(42)",
        "graft_quality_signals(42)", "graft_chunks(42, 8, 0)",
        "graft_jaccard(42, 'x y z', 3)", "graft_jaccard('x y z', 42, 3)",
        "graft_simhash63(42)", "graft_pii_redact(42)",
        "graft_cc_redact(42)", "graft_luhn_valid(42)").foreach { call =>
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call").head
      }
    }
    // chunk shape params stay plan-time literals with loud contracts
    val lit = intercept[Exception](
      spark.sql("SELECT graft_chunks('a b c', length('xx'), 0)").head)
    assert(lit.getMessage.contains("integer literal"))
    val bad = intercept[Exception](
      spark.sql("SELECT graft_chunks('a b c', 2, 5)").head)
    assert(bad.getMessage.contains("overlap"))
  }

  test("text kernels reject wrong input types at ANALYSIS, not CCE per task") {
    GraftExtensions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_shingles(42, 3)").head
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sig(array(1, 2), 16)").head
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ngram_repetition(array('a'))").head
    }
    // shape parameters must be integer literals, loudly
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash_bands(graft_shingles('a b c', 2), 16, 5)").head)
    assert(e.getMessage.contains("bands must divide numHashes"))
    val lit = intercept[Exception](
      spark.sql("SELECT graft_shingles('a b c', length('xx'))").head)
    assert(lit.getMessage.contains("integer literal"))
  }

  test("graft_image_stats / graft_wav_stats match the DataFrame decode ops") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when, lit => slit}
    val img = graft.ops.Multimodal.synthesizeImageAssets(
        (0L until 8L).toDF("id"), "id")
      .withColumn("content", when(col("asset_id") === 5L,
        slit("garbage".getBytes)).otherwise(col("content")))
    img.createOrReplaceTempView("ge_media_img")
    val viaSql = spark.sql(
      """SELECT asset_id, s.decode_ok, s.width, s.height, s.n_pixels,
                s.sum_gray, s.min_gray, s.max_gray, s.sum_sq_gray,
                s.n_distinct_gray, s.top_gray_freq, s.ahash63
         FROM (SELECT asset_id, graft_image_stats(content) AS s
               FROM ge_media_img) ORDER BY asset_id""").collect()
    val viaDf = graft.ops.Multimodal.decodeImageFeatures(img)
      .orderBy("asset_id").collect()
    viaSql.indices.foreach(i => assert(viaSql(i) == viaDf(i),
      s"image row $i: ${viaSql(i)} vs ${viaDf(i)}"))
    assert(!viaSql(5).getBoolean(1)) // the corrupt row is flagged, kept

    val wav = graft.ops.Multimodal.synthesizeAudioAssets(
      (0L until 8L).toDF("id"), "id")
    wav.createOrReplaceTempView("ge_media_wav")
    val aSql = spark.sql(
      """SELECT asset_id, s.decode_ok, s.sample_rate, s.channels,
                s.n_samples, s.peak, s.sum_sq, s.zero_crossings,
                s.audio_hash63
         FROM (SELECT asset_id, graft_wav_stats(content) AS s
               FROM ge_media_wav) ORDER BY asset_id""").collect()
    val aDf = graft.ops.Multimodal.decodeAudioFeatures(wav)
      .orderBy("asset_id").collect()
    aSql.indices.foreach(i => assert(aSql(i) == aDf(i),
      s"audio row $i: ${aSql(i)} vs ${aDf(i)}"))

    // the RGB twin: parity with decodeRgbFeatures on genuinely-colored
    // assets (r != g != b everywhere, so a red-only path can't pass),
    // including a corrupt row
    val rgb = graft.ops.Multimodal.synthesizeRgbImageAssets(
        (0L until 8L).toDF("id"), "id")
      .withColumn("content", when(col("asset_id") === 3L,
        slit("garbage".getBytes)).otherwise(col("content")))
    rgb.createOrReplaceTempView("ge_media_rgb")
    val rSql = spark.sql(
      """SELECT asset_id, s.decode_ok, s.width, s.height, s.n_pixels,
                s.sum_r, s.min_r, s.max_r, s.sum_g, s.min_g, s.max_g,
                s.sum_b, s.min_b, s.max_b
         FROM (SELECT asset_id, graft_rgb_stats(content) AS s
               FROM ge_media_rgb) ORDER BY asset_id""").collect()
    val rDf = graft.ops.Multimodal.decodeRgbFeatures(rgb)
      .orderBy("asset_id").collect()
    rSql.indices.foreach(i => assert(rSql(i) == rDf(i),
      s"rgb row $i: ${rSql(i)} vs ${rDf(i)}"))
    assert(!rSql(3).getBoolean(1)) // the corrupt row is flagged, kept
    // and the channels genuinely differ (the single-channel trap)
    assert(rSql(0).getLong(5) != rSql(0).getLong(8) &&
      rSql(0).getLong(8) != rSql(0).getLong(11))

    // strict binary pins: a string is an ANALYSIS error, not re-encoded
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_image_stats('not bytes')").head
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_wav_stats(42)").head
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_rgb_stats('not bytes')").head
    }
    // bare NULL: null-in/null-out (null STRUCT, not a decode_ok=false row)
    val n = spark.sql(
      "SELECT graft_image_stats(NULL) AS i, graft_wav_stats(NULL) AS w, " +
        "graft_rgb_stats(NULL) AS r").head
    assert(n.isNullAt(0) && n.isNullAt(1) && n.isNullAt(2))
  }
}
