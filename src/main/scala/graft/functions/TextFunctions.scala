package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression surface for large-scale training-data
  * pipelines: tokenization, shingling, quality features, language-ID
  * heuristic, fingerprinting, SimHash. Everything is codegen'd built-in
  * expressions (no UDFs) over a whitespace token model, chosen so each
  * derived value is exactly reproducible in an external SQL engine.
  */
object TextFunctions {

  /** Whitespace tokens (matches DuckDB string_split(text, ' ')). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles: ["a b c", "b c d", ...]. Empty when
    * the text has fewer than n tokens. Fused JVM expression — value-
    * identical to [[shinglesSql]] (the form external oracles replicate;
    * parity asserted in TextFunctionsSpec). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShinglesExpr(org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Pure-SQL shingling (reference semantics for oracle parity). */
  def shinglesSql(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Default stopword lists per language for the heuristic language ID
    * and stopword-ratio features. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "ich")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no")
  val StopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce")

  /** Raw (NON-distinct, order-preserving) word 2-grams — repetition and
    * LM-surprisal signals need the multiset, unlike the dedup shingles'
    * distinct-set semantics. Lives HERE with the other tokenization
    * contracts (tokens/shingles) its consumers must stay consistent
    * with — the concat_ws(" ") join key is injective because tokens
    * contain no spaces, a contract bigramSurprisal relies on. */
  def rawBigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))

  /** Fraction of tokens that appear in `words`. */
  def wordRatio(text: Column, words: Seq[String]): Column =
    wordRatioOf(tokens(text), words)

  /** [[wordRatio]] over an already-bound token array — the form callers
    * use under a [[let1]] binding so the split isn't rebuilt per
    * consumer (see TextAnalysis.analyze). Same expression, same values. */
  def wordRatioOf(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Fused surface-stat struct for one text column: token count,
    * summed token chars, BPE estimate, and the four language stopword
    * hit counts, in ONE JVM pass ([[TextStatsExpr]]). The text->value
    * feature functions below derive their ratios/scores from these
    * exact integer counts with the same Column arithmetic as their
    * `...Of` HOF twins — value-identical by construction (kernel
    * counts parity-pinned in TextFunctionsSpec). */
  private[graft] def textStats(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TextStatsExpr(org.apache.spark.sql.GraftSqlBridge.expression(text),
        Seq(StopwordsEn, StopwordsDe, StopwordsEs, StopwordsFr)))

  /** Ratio of a hit count to greatest(n_tokens, 1) — the wordRatioOf
    * quotient over the fused counts. */
  private[graft] def hitRatio(st: Column, slot: Int): Column =
    element_at(st.getField("hits"), slot).cast("double") /
      greatest(st.getField("n_tokens"), lit(1L)).cast("double")

  def stopwordRatio(text: Column): Column =
    // let1-bound like every sibling fused entry point: hitRatio reads
    // the struct twice (hits numerator, n_tokens denominator), and
    // projection collapse would duplicate the whole kernel per read.
    let1(textStats(text))(st => hitRatio(st, 1))

  def stopwordRatioOf(toks: Column): Column = wordRatioOf(toks, StopwordsEn)

  /** Fraction of characters in [.,!?;:]. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** BPE-ish subword token estimate: per whitespace token,
    * ceil(len/4) subwords (the ~4-chars-per-BPE-token rule of thumb),
    * summed. Integer arithmetic — exact in any engine. */
  def bpeTokenEstimate(text: Column): Column =
    textStats(text).getField("bpe_est")

  def bpeTokenEstimateOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    let1(textStats(text)) { st =>
      st.getField("sum_token_chars").cast("double") /
        greatest(st.getField("n_tokens"), lit(1L)).cast("double")
    }

  def meanTokenLenOf(toks: Column): Column =
    aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double")) /
      greatest(size(toks), lit(1)).cast("double")

  /** Composite [0,1] quality score from cheap surface features —
    * length band + stopword presence + reasonable word lengths.
    * A heuristic in the spirit of C4/Gopher-style quality filters.
    * One fused stats pass; identical formula to [[qualityScoreOf]]. */
  def qualityScore(text: Column): Column =
    let1(textStats(text)) { st =>
      qualityFormula(text,
        hitRatio(st, 1),
        st.getField("sum_token_chars").cast("double") /
          greatest(st.getField("n_tokens"), lit(1L)).cast("double"))
    }

  def qualityScoreOf(text: Column, toks: Column): Column =
    qualityFormula(text, stopwordRatioOf(toks), meanTokenLenOf(toks))

  /** The score formula shared by the fused and HOF entry points: its
    * inputs (stopword ratio, mean token length) are identical doubles
    * from either path, so the outputs are bit-equal. */
  private[graft] def qualityFormula(text: Column, swRatio: Column, mtl: Column): Column = {
    val lenScore = when(length(text).between(50, 2000), 1.0)
      .when(length(text) < 50, length(text).cast("double") / 50.0)
      .otherwise(lit(2000.0) / length(text).cast("double"))
    val swScore = least(swRatio * 5.0, lit(1.0))
    val wordScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore + swScore + wordScore) / 3.0, 4)
  }

  /** Heuristic language ID: argmax of per-language stopword hit ratios;
    * 'und' when every score is zero. Ties break in fixed order
    * en > de > es > fr. One fused stats pass; the fold and its ratio
    * inputs are identical to [[langGuessOf]]'s. */
  def langGuess(text: Column): Column =
    let1(textStats(text)) { st =>
      langFold(Seq("en" -> hitRatio(st, 1), "de" -> hitRatio(st, 2),
        "es" -> hitRatio(st, 3), "fr" -> hitRatio(st, 4)))
    }

  def langGuessOf(toks: Column): Column =
    langFold(Seq(
      "en" -> wordRatioOf(toks, StopwordsEn), "de" -> wordRatioOf(toks, StopwordsDe),
      "es" -> wordRatioOf(toks, StopwordsEs), "fr" -> wordRatioOf(toks, StopwordsFr)))

  /** The argmax fold shared by the fused and HOF entry points. */
  private[graft] def langFold(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > 0.0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Token-window chunking for embedding pipelines: overlapping windows
    * of `chunkSize` tokens advancing by `chunkSize - overlap`, each
    * re-joined with single spaces. The last window is clamped (shorter
    * tail kept, never dropped); texts with <= chunkSize tokens yield
    * exactly one chunk. Pure codegen'd built-ins — no shuffle — and
    * integer-exact chunk counts, so an external engine reproduces the
    * chunking verbatim (see q_chunk's oracle). The reference ingests
    * pre-chunked langchain documents (reference:
    * src/langchain_memvid/vectorstore.py:197-212, Encoder.add_chunks);
    * this operator brings the chunking step itself into the engine. */
  def chunks(text: Column, chunkSize: Int, overlap: Int = 0): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ChunksExpr(org.apache.spark.sql.GraftSqlBridge.expression(text),
        chunkSize, overlap))

  /** The interpreted HOF chunking [[chunks]] replaced — kept as the
    * oracle-parity reference (q_chunk's DuckDB oracle replicates this
    * arithmetic; TextFunctionsSpec pins the fused kernel against it). */
  private[graft] def chunksSql(text: Column, chunkSize: Int, overlap: Int = 0): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(text)
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1L)).otherwise(
      floor((n - chunkSize + stride - 1).cast("double") / stride).cast("long") + 1L)
    transform(sequence(lit(0L), nChunks - 1), i =>
      concat_ws(" ", slice(toks, (i * stride + 1).cast("int"), lit(chunkSize))))
  }

  /** Normalized-text content fingerprint: sha256 of lowercased,
    * whitespace-collapsed text (for exact near-canonical dedup).
    * The whitespace class is explicit ([ \t\n\r\f]) rather than \s:
    * Java's \s includes \x0B (vertical tab) but RE2-based engines'
    * (DuckDB) \s does not — the explicit class means one character set
    * in every engine. */
  def fingerprint(text: Column): Column =
    // trim AFTER collapsing: Spark trim strips only ASCII spaces, so a
    // leading tab/newline must first collapse to a space to be trimmed —
    // trim-first left whitespace-variant duplicates with different
    // fingerprints (oracle twin FingerprintSql mirrors this order).
    sha2(trim(regexp_replace(lower(text), "[ \\t\\n\\r\\f]+", " ")), 256)

  /** Unicode cleanup for crawl text (the C4/CCNet pre-pass): NFC
    * canonicalization ([[NfcNormalizeExpr]], codegen'd — combining-mark
    * and precomposed encodings of the same text get identical bytes),
    * then format-character strip (ZWSP, BOM, bidi marks — Cf), then
    * unicode-space + control collapse to single ASCII spaces, trimmed.
    * Cf strips BEFORE the collapse so "space ZWSP space" can't survive
    * as a double space. Character classes are Unicode-property-based
    * ([\\p{Zs}\\p{Cc}], never \\s) — Java and RE2 engines agree on
    * properties, while \\s differs between them (see [[fingerprint]]).
    * Everything but the NFC kernel is codegen'd built-ins; case is
    * deliberately PRESERVED (lowercase is [[fingerprint]]'s job). */
  def normalizeText(text: Column): Column = {
    val nfc = org.apache.spark.sql.GraftSqlBridge.column(
      NfcNormalizeExpr(org.apache.spark.sql.GraftSqlBridge.expression(text)))
    trim(regexp_replace(
      regexp_replace(nfc, "\\p{Cf}", ""),
      "[\\p{Zs}\\p{Cc}]+", " "))
  }

  /** SimHash over the (multiset of) whitespace tokens: each token's
    * hash60 votes ±1 on bits 0..62; bit j of the result is 1 when the
    * vote sum is positive. Fused JVM expression ([[Simhash63Expr]], one
    * sha + primitive vote loop per token) — value-identical to
    * [[simhash63Sql]], the HOF form external oracles replicate (parity
    * asserted in TextFunctionsSpec). EFFECTIVE RESOLUTION is 60 bits:
    * hash60 values never set bits 60-62, so those positions always
    * vote −1 and stay 0 in every output (both forms compute them
    * identically — they just carry no signal; Dedup.simhashPairs' top
    * band has correspondingly fewer effective bits). */
  def simhash63(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Simhash63Expr(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** Pure-SQL token-vote SimHash (reference semantics for oracle
    * parity — see [[simhash63]] for the contract). */
  def simhash63Sql(text: Column): Column = {
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 63),
      // let1-bound: referenced bare inside the per-bit transform, the
      // hash60 tree (sha256+substring+conv) would inline 63× per token
      // — the projection-collapse trap let1 exists for.
      (acc, t) => let1(HashFunctions.hash60(t)) { h =>
        zip_with(acc, transform(sequence(lit(0), lit(62)),
          j => when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)),
          (a, b) => a + b)
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(62)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Modulus for MinHash universal hashing: largest prime below 2^30,
    * so coefficient*hash products stay under 2^60 (no 64-bit overflow
    * in any engine). */
  val MinhashP: Long = 1073741789L

  /** Deterministic affine-rehash coefficients (a_s in [1, P-1],
    * b_s in [0, P-1]), derived from sha256 so external oracles can
    * inline the identical literals. */
  def minhashCoeffs(numHashes: Int): (Seq[Long], Seq[Long]) = (
    (0 until numHashes).map(s => (HashFunctions.hash60Local(s"minhash-a:$s") % (MinhashP - 1)) + 1),
    (0 until numHashes).map(s => HashFunctions.hash60Local(s"minhash-b:$s") % MinhashP))

  /** Evaluate-once binding for an expensive sub-expression: Catalyst's
    * projection collapse happily duplicates a sub-expression into every
    * use site (e.g. 16 element_at calls -> 16 evaluations of the whole
    * tree). Wrapping the value in a 1-element array and referencing it
    * through a lambda variable forces single evaluation per row. */
  def let1(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), v => body(v)), 1)

  /** MinHash signature from a (distinct) shingle-array column: one
    * sha-derived base hash per shingle, then numHashes cheap universal
    * rehashes h_s = (a_s*h0 + b_s) mod P — NOT numHashes sha256 passes
    * (16x less hashing; the classic Broder '97 construction). The base
    * hash array is let1-bound so it's computed once, not per seed.
    * Docs with an EMPTY shingle array get Long.MaxValue entries; a NULL
    * shingle array yields a NULL signature — matching the fused
    * [[minhashSignatureFused]] (whose null-safe eval short-circuits),
    * so the documented value-identity holds for null input too instead
    * of the HOF form fabricating a MaxValue signature that would band
    * every null-text doc into one giant candidate bucket. */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int): Column = {
    val (as, bs) = minhashCoeffs(numHashes)
    val aLit = typedlit(as)
    val bLit = typedlit(bs)
    val sig = let1(transform(sh, x => HashFunctions.hash60(x) % MinhashP)) { h0 =>
      transform(sequence(lit(0), lit(numHashes - 1)), s =>
        coalesce(
          array_min(transform(h0, h =>
            (element_at(aLit, s + 1) * h + element_at(bLit, s + 1)) % MinhashP)),
          lit(Long.MaxValue)))
    }
    when(sh.isNull, lit(null).cast("array<bigint>")).otherwise(sig)
  }

  /** MinHash signature over a text column's n-gram shingles. */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    minhashSignatureFromShingles(shingles(text, n), numHashes)

  /** Fused single-pass form of [[minhashSignatureFromShingles]]
    * (value-identical; parity asserted in TextFunctionsSpec). */
  def minhashSignatureFused(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSigExpr(org.apache.spark.sql.GraftSqlBridge.expression(sh), numHashes))

  /** Fused LSH band keys "b|v0|..|v{r-1}" from one signature pass —
    * the join key column for MinHash banding (see Dedup.minhashLshPairs).
    */
  def minhashBands(sh: Column, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashBandsExpr(org.apache.spark.sql.GraftSqlBridge.expression(sh), numHashes, bands))
}
