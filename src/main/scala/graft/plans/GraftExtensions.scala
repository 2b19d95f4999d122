package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, DotProductExpr, DotProductInt8Expr,
  Hamming64Expr, HashEmbedExpr, L2DistanceExpr, MinHashBandsExpr, MinHashSigExpr,
  ShinglesExpr}

/** SparkSessionExtensions installer: exposes the fused vector kernels
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works anywhere DataFrame code does — including pure-SQL frontends.
  *
  * Wire up either way:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)                       // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Opt-in ANN acceleration (inert until a store is registered AND
    // spark.graft.ivf.autoPrune=true — see IvfTopKPruneRule).
    ext.injectOptimizerRule(spark => IvfTopKPruneRule(spark))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.0", "", "internal")

  private def binary(name: String, usage: String,
                     f: (Expression, Expression) => Expression) = {
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      f(args(0), args(1))
    }
    (name, info(name, usage), builder)
  }

  /** Integer-literal argument extraction (the graft_hash_embed
    * pattern): kernel shape parameters (n-gram size, hash counts) are
    * plan-time constants of the expression, never per-row values. */
  private def intLit(name: String, arg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name $arg must be an integer literal, got $other")
  }

  /** One strictly-pinned text argument of a Column-composed builder:
    * every string arg a registration hands to a Column composition goes
    * through here, so no multi-arg function can forget the pin on one
    * of its arguments (the bug class the pins exist to prevent). */
  private def strictCol(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.GraftSqlBridge.GraftStrictString(e))

  /** Column-COMPOSED unary text function with a STRICT string pin:
    * these lower the same built-in tree the Scala API produces (SQL/
    * DataFrame bit-parity by construction), but the built-ins carry
    * ImplicitCastInputTypes and would silently stringify a numeric
    * column — GraftStrictString makes mis-typed input an ANALYSIS
    * error, matching the custom-kernel bridge traits (r12). */
  private def strictText(name: String, usage: String,
                         f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == 1, s"$name expects 1 argument (text)")
      org.apache.spark.sql.GraftSqlBridge.catalystExpression(f(strictCol(args(0))))
    }
    (name, info(name, usage), builder)
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("graft_dot", "graft_dot(a, b) - dot product of two double arrays",
      DotProductExpr.apply),
    binary("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays",
      CosineSimilarityExpr.apply),
    binary("graft_l2", "graft_l2(a, b) - euclidean distance of two double arrays",
      L2DistanceExpr.apply),
    ("graft_hash_embed",
      info("graft_hash_embed", "graft_hash_embed(text, dim) - deterministic sha-seeded unit embedding"),
      { args: Seq[Expression] =>
        require(args.length == 2, s"graft_hash_embed expects (text, dim)")
        val dim = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hash_embed dim must be an integer literal, got $other")
        }
        HashEmbedExpr(args(0), dim)
      }),
    ("graft_ngram_repetition",
      info("graft_ngram_repetition",
        "graft_ngram_repetition(text) - Gopher repetition masses: " +
          "struct<tot_chars, top_mass_2/3/4, dup_mass_5..10> (token code-point " +
          "chars; fraction = mass / greatest(tot_chars, 1))"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"graft_ngram_repetition expects (text)")
        // Full A1.1 dup set, matching the DataFrame default (r12): a
        // SQL surface stuck on Seq(5, 10) would be the same silently
        // narrowed gate the default change closed.
        graft.functions.NgramRepetitionExpr(args(0), Seq(2, 3, 4), 5 to 10)
      }),
    // --- r12 additions: the dedup/search text kernels + Luhn ---------
    binary("graft_dot_int8",
      "graft_dot_int8(a, b) - dot product of two int8-quantized (tinyint array) vectors",
      DotProductInt8Expr.apply),
    ("graft_shingles",
      info("graft_shingles",
        "graft_shingles(text, n) - distinct word n-gram shingles, first-occurrence order"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_shingles expects (text, n)")
        ShinglesExpr(args(0), intLit("graft_shingles", "n", args(1)))
      }),
    ("graft_minhash_sig",
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, numHashes) - MinHash signature (array<bigint>) of a shingle array"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_minhash_sig expects (shingles, numHashes)")
        MinHashSigExpr(args(0), intLit("graft_minhash_sig", "numHashes", args(1)))
      }),
    ("graft_minhash_bands",
      info("graft_minhash_bands",
        "graft_minhash_bands(shingles, numHashes, bands) - LSH band keys " +
          "('b|v0|..'); equi-join on a key for near-dup candidates"),
      { args: Seq[Expression] =>
        require(args.length == 3,
          "graft_minhash_bands expects (shingles, numHashes, bands)")
        MinHashBandsExpr(args(0),
          intLit("graft_minhash_bands", "numHashes", args(1)),
          intLit("graft_minhash_bands", "bands", args(2)))
      }),
    // Column-composed functions (no dedicated Expression; the bridge
    // lowers the same built-in tree the Scala API produces, so SQL and
    // DataFrame callers are bit-identical by construction).
    strictText("graft_simhash63",
      "graft_simhash63(text) - 63-bit token-vote SimHash fingerprint (bigint)",
      graft.functions.TextFunctions.simhash63),
    ("graft_luhn_valid",
      info("graft_luhn_valid",
        "graft_luhn_valid(digits) - Luhn checksum over a digit run " +
          "(dashes/spaces stripped; anything else -> false, null -> null); " +
          "what separates a card number from an order id"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_luhn_valid expects (candidate)")
        // Pii.luhnValid's contract assumes a CcPattern-proposed
        // candidate; arbitrary SQL input needs the digit-run guard
        // HERE — unguarded, '' builds sequence(1, 0) (which DESCENDS)
        // and non-digits fail the ANSI cast mid-fold instead of
        // reading as "not a card". The guard is a CaseWhen BRANCH,
        // not an And conjunct: the optimizer may split/reorder And
        // conjuncts (predicate pushdown in a WHERE), letting the
        // fold's cast see non-digit input; CaseWhen branch order is
        // guaranteed. Null keeps null-in/null-out: a null candidate
        // falls through both branches to the null otherwise.
        val t = strictCol(args(0))
        val digits = org.apache.spark.sql.functions.translate(t, "- ", "")
        import org.apache.spark.sql.functions.{when, lit}
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          when(digits.rlike("^[0-9]+$"), graft.ops.Pii.luhnValid(t))
            .when(t.isNotNull, lit(false)))
      }),
    strictText("graft_pii_redact",
      "graft_pii_redact(text) - emails, then phones, then IPv4 replaced " +
        "with <EMAIL>/<PHONE>/<IP> (the Pii.redactCol cascade)",
      graft.ops.Pii.redactCol),
    strictText("graft_cc_redact",
      "graft_cc_redact(text) - Luhn-valid card candidates (grouping-" +
        "agnostic maximal digit runs) replaced with <CC>; invalid digit " +
        "runs survive",
      t => org.apache.spark.sql.functions.aggregate(
        graft.ops.Pii.ccCandidatesCol(t), t,
        (acc, c) => org.apache.spark.sql.functions.replace(acc, c,
          org.apache.spark.sql.functions.lit("<CC>")))),
    // --- r13 additions: fingerprint distance + the quality/text tier.
    // Everything a pure-SQL training-data pipeline filters on before
    // embedding: normalize -> fingerprint/simhash -> hamming, language
    // id, quality score, the full Gopher signal struct, token budget,
    // URL canonicalization, chunking. Each is the EXACT Column tree
    // the Scala API builds (bit-parity by construction) behind a
    // strict analysis-time type pin.
    binary("graft_hamming64",
      "graft_hamming64(a, b) - popcount(a XOR b) of two 64-bit " +
        "fingerprint bigints (the distance half of graft_simhash63); " +
        "narrower integrals need an explicit CAST",
      Hamming64Expr.apply),
    strictText("graft_quality_score",
      "graft_quality_score(text) - composite [0,1] surface-quality score " +
        "(length band + stopword presence + mean word length), 4 dp",
      graft.functions.TextFunctions.qualityScore),
    strictText("graft_lang_guess",
      "graft_lang_guess(text) - heuristic language id (argmax stopword " +
        "hit ratio): 'en'/'de'/'es'/'fr', or 'und' when all scores are 0",
      graft.functions.TextFunctions.langGuess),
    strictText("graft_stopword_ratio",
      "graft_stopword_ratio(text) - fraction of tokens in the English " +
        "stopword list",
      graft.functions.TextFunctions.stopwordRatio),
    strictText("graft_punct_ratio",
      "graft_punct_ratio(text) - [.,!?;:] characters / total characters",
      graft.functions.TextFunctions.punctRatio),
    strictText("graft_token_estimate",
      "graft_token_estimate(text) - BPE-ish subword token-count estimate " +
        "(sum of ceil(word_len / 4) per whitespace token; bigint)",
      graft.functions.TextFunctions.bpeTokenEstimate),
    strictText("graft_normalize_text",
      "graft_normalize_text(text) - NFC + format-char strip + unicode " +
        "space/control collapse, trimmed (case preserved)",
      graft.functions.TextFunctions.normalizeText),
    strictText("graft_fingerprint",
      "graft_fingerprint(text) - sha256 of lowercased whitespace-" +
        "collapsed text (exact near-canonical dedup key)",
      graft.functions.TextFunctions.fingerprint),
    strictText("graft_url_canonicalize",
      "graft_url_canonicalize(url) - scheme/host lowercased, default " +
        "ports + fragments + tracking params stripped, path normalized",
      graft.ops.UrlOps.canonicalize),
    strictText("graft_text_analysis",
      "graft_text_analysis(text) - the whole feature row in ONE stats " +
        "pass: struct<n_tokens, est_bpe_tokens, n_chars, stopword_ratio, " +
        "punct_ratio, mean_token_len, quality, lang_guess, fingerprint>; " +
        "null text -> null struct. Prefer this over selecting several " +
        "single-feature graft_* calls (each pays its own pass)",
      graft.ops.TextAnalysis.analyzeStruct),
    strictText("graft_quality_signals",
      "graft_quality_signals(text) - Gopher signal struct<n_tokens, " +
        "distinct_token_ratio, top_token_frac, dup_bigram_frac, " +
        "symbol_ratio, gopher_keep>; null text -> null struct " +
        "(coalesce(s.gopher_keep, false) for the drop-not-limbo rule)",
      graft.ops.QualitySignals.signalsStruct),
    ("graft_jaccard",
      info("graft_jaccard",
        "graft_jaccard(a, b, n) - word n-gram Jaccard similarity of two " +
          "texts (distinct shingles, |A∩B| / |A∪B|); NULL when either " +
          "text is null or neither text has an n-gram — the scalar " +
          "verification half of the dedup pair joins"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_jaccard expects (a, b, n)")
        val n = intLit("graft_jaccard", "n", args(2))
        import org.apache.spark.sql.functions.{array_intersect, size, when}
        import graft.functions.TextFunctions.{let1, shingles}
        val a = strictCol(args(0))
        val b = strictCol(args(1))
        // |A∩B| / (|A| + |B| - |A∩B|) over the DISTINCT shingle arrays —
        // the exact statistic Dedup.ngramJaccardPairs computes from its
        // candidate join, so a SQL caller verifying one pair gets the
        // same number the distributed screen would. The division lives
        // in a when() branch: two too-short texts have no shingles, and
        // 0/0 must read "no n-gram evidence" (NULL), not an ANSI error.
        // The isNotNull gate keeps the arithmetic off null arrays
        // entirely (size(null) is regime-dependent; a null text must
        // null the score under every conf).
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          when(a.isNotNull && b.isNotNull,
            let1(shingles(a, n)) { sa =>
              let1(shingles(b, n)) { sb =>
                let1(size(array_intersect(sa, sb)).cast("double")) { common =>
                  let1((size(sa) + size(sb)).cast("double") - common) { denom =>
                    when(denom > 0.0, common / denom)
                  }
                }
              }
            }))
      }),
    ("graft_chunks",
      info("graft_chunks",
        "graft_chunks(text, chunkSize, overlap) - overlapping token " +
          "windows re-joined with single spaces (array<string>); the " +
          "embedding-pipeline chunker"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_chunks expects (text, chunkSize, overlap)")
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          graft.functions.TextFunctions.chunks(strictCol(args(0)),
            intLit("graft_chunks", "chunkSize", args(1)),
            intLit("graft_chunks", "overlap", args(2))))
      }),
    // --- r14 additions: the REAL media codecs on the SQL surface -----
    ("graft_image_stats",
      info("graft_image_stats",
        "graft_image_stats(bytes) - decode an image (PNG/BMP/GIF/JPEG, " +
          "format-sniffed) and return struct<decode_ok, width, height, " +
          "n_pixels, sum_gray, min_gray, max_gray, sum_sq_gray, " +
          "n_distinct_gray, top_gray_freq, ahash63> (the last three feed " +
          "blank/low-contrast quality gates); undecodable " +
          "bytes -> decode_ok=false with null features, null -> null"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_image_stats expects (bytes)")
        graft.functions.ImageStatsExpr(args(0))
      }),
    ("graft_rgb_stats",
      info("graft_rgb_stats",
        "graft_rgb_stats(bytes) - decode an image keeping all three " +
          "channels and return struct<decode_ok, width, height, " +
          "n_pixels, sum_r, min_r, max_r, sum_g, min_g, max_g, sum_b, " +
          "min_b, max_b> (exact per-channel integer folds — the " +
          "quality-gate inputs for real RGB corpora); undecodable " +
          "bytes -> decode_ok=false with null features, null -> null"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_rgb_stats expects (bytes)")
        graft.functions.RgbStatsExpr(args(0))
      }),
    ("graft_wav_stats",
      info("graft_wav_stats",
        "graft_wav_stats(bytes) - decode RIFF/WAV PCM16 (mono or " +
          "stereo-folded) and return struct<decode_ok, sample_rate, " +
          "channels, n_samples, peak, sum_sq, zero_crossings, " +
          "audio_hash63> (the last is the banded near-dup fingerprint, " +
          "null for clips under 63 samples); " +
          "undecodable bytes -> decode_ok=false, null -> null"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_wav_stats expects (bytes)")
        graft.functions.WavStatsExpr(args(0))
      })
  )

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
